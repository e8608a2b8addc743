"""Deterministic partitioned Iceberg fixture (FIXTURES.md §3).

The reference's golden table has an empty partition spec, so manifest
pruning, partition-value pruning and transform rewrite (SURVEY §2 A4-A7)
have zero coverage there.  This builds, once per checkout, a v1 table
partitioned by all four transform families:

    sym_bucket  = bucket[4](sym)
    day_ts_day  = day(day_ts)
    cat         = identity(cat)
    qty_trunc   = truncate[10](qty)

3 snapshots: append 150 rows → append 50 rows (second manifest) → delete
all files of (cat='news', day=2024-01-01).  The delete predicate uses only
content-derivable partitions (identity + day), so a DuckDB oracle over the
raw data files can reproduce the live rowset with a plain WHERE clause —
no dependence on our own planner.
"""

from __future__ import annotations

import datetime
import os
from decimal import Decimal

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".fixtures", "part_table")

SYMS = ["AAPL", "MSFT", "GOOG", "AMZN"]
CATS = ["news", "blog"]
DAY1 = datetime.datetime(2024, 1, 1)
DAY2 = datetime.datetime(2024, 1, 2)
DAYS = [DAY1, DAY2]
DAY1_EPOCH_DAYS = (DAY1.date() - datetime.date(1970, 1, 1)).days

SCHEMA_FIELDS = [
    {"id": 1, "name": "id", "type": "long", "required": True},
    {"id": 2, "name": "sym", "type": "string", "required": False},
    {"id": 3, "name": "day_ts", "type": "timestamp", "required": False},
    {"id": 4, "name": "cat", "type": "string", "required": False},
    {"id": 5, "name": "price", "type": "decimal(10,2)", "required": False},
    {"id": 6, "name": "qty", "type": "int", "required": False},
]

PARTITION_SPEC = [
    {"name": "sym_bucket", "transform": "bucket[4]", "source": "sym"},
    {"name": "day_ts_day", "transform": "day", "source": "day_ts"},
    {"name": "cat", "transform": "identity", "source": "cat"},
    {"name": "qty_trunc", "transform": "truncate[10]", "source": "qty"},
]


def make_rows(n: int, start: int = 0) -> list[dict]:
    rows = []
    for i in range(start, start + n):
        day = DAYS[(i // 4) % 2]
        rows.append(
            {
                "id": i,
                "sym": SYMS[i % 4],
                "day_ts": day + datetime.timedelta(hours=i % 24),
                "cat": CATS[(i // 8) % 2],
                "price": Decimal(f"{(i % 50)}.25"),
                "qty": (i * 7) % 20,
            }
        )
    return rows


def ensure_partitioned_fixture(path: str = FIXTURE_DIR) -> str:
    """Build the fixture if absent; deterministic content → stable paths."""
    hint = os.path.join(path, "metadata", "version-hint.text")
    if os.path.exists(hint):
        return path
    from daskberg_spark.iceberg.writer import IcebergWriter

    writer = IcebergWriter(path, SCHEMA_FIELDS, PARTITION_SPEC)
    writer.append(make_rows(150, 0))
    writer.append(make_rows(50, 150))
    writer.delete_files(
        lambda df: df["partition"]["cat"] == "news"
        and df["partition"]["day_ts_day"] == DAY1_EPOCH_DAYS
    )
    return path


# SQL fragment reproducing the delete, content-only (for DuckDB oracles).
LIVE_WHERE = (
    "NOT (cat = 'news' AND CAST(day_ts AS DATE) = DATE '2024-01-01')"
)
