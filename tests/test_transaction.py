"""Multi-table filesystem Transaction: two-phase (stage metadata, flip
hints) all-or-nothing visibility — the local analogue of the REST
catalog's commit_transaction (r10 verdict item 6)."""

from __future__ import annotations

import os

import pytest

import daskberg_spark.iceberg.scan  # noqa: F401
from daskberg_spark.iceberg.metadata import IcebergTable
from daskberg_spark.iceberg.writer import IcebergWriter, Transaction, write_df


def _writer(path, name):
    return IcebergWriter(
        str(path),
        [
            {"id": 1, "name": f"{name}_id", "type": "long", "required": False},
            {"id": 2, "name": "v", "type": "double", "required": False},
        ],
    )


def _rows(name, lo, hi):
    return [{f"{name}_id": i, "v": float(i)} for i in range(lo, hi)]


def test_transaction_both_visible_only_after_exit(spark, tmp_path):
    a = _writer(tmp_path / "a", "a")
    b = _writer(tmp_path / "b", "b")
    a.append(_rows("a", 0, 5))
    b.append(_rows("b", 0, 5))
    with Transaction(a, b):
        a.append(_rows("a", 5, 10))
        b.append(_rows("b", 5, 10))
        # mid-transaction: readers still see the pre-transaction state
        assert IcebergTable(str(tmp_path / "a")).to_df(spark).count() == 5
        assert IcebergTable(str(tmp_path / "b")).to_df(spark).count() == 5
    assert IcebergTable(str(tmp_path / "a")).to_df(spark).count() == 10
    assert IcebergTable(str(tmp_path / "b")).to_df(spark).count() == 10


def test_transaction_aborts_both_on_failure(spark, tmp_path):
    a = _writer(tmp_path / "a", "a")
    b = _writer(tmp_path / "b", "b")
    a.append(_rows("a", 0, 5))
    b.append(_rows("b", 0, 5))
    with pytest.raises(RuntimeError, match="injected"):
        with Transaction(a, b):
            a.append(_rows("a", 5, 10))
            raise RuntimeError("injected failure before b commits")
    # neither table moved — including the one that DID commit in phase 1
    assert IcebergTable(str(tmp_path / "a")).to_df(spark).count() == 5
    assert IcebergTable(str(tmp_path / "b")).to_df(spark).count() == 5
    # staged metadata was unlinked: no version beyond the published hint
    with open(tmp_path / "a" / "metadata" / "version-hint.text") as f:
        published = int(f.read().strip())
    staged_left = [
        f
        for f in os.listdir(tmp_path / "a" / "metadata")
        if f.startswith("v")
        and f.endswith(".metadata.json")
        and int(f[1:].split(".")[0]) > published
    ]
    assert staged_left == []
    # so a reloaded writer re-commits the same version with no conflict
    a2 = IcebergWriter.load(str(tmp_path / "a"))
    a2.append(_rows("a", 5, 8))
    assert IcebergTable(str(tmp_path / "a")).to_df(spark).count() == 8
    # the aborted writer object is poisoned
    with pytest.raises(RuntimeError, match="aborted in a transaction"):
        a.append(_rows("a", 50, 51))


def test_transaction_write_df_and_nested_guards(spark, tmp_path):
    from pyspark.sql import functions as F

    a = _writer(tmp_path / "a", "a")
    b = _writer(tmp_path / "b", "b")
    with Transaction(a, b):
        write_df(
            a,
            spark.range(0, 20).select(
                F.col("id").alias("a_id"), (F.col("id") * 0.5).alias("v")
            ),
            mode="none",
        )
        b.append(_rows("b", 0, 7))
        with pytest.raises(ValueError, match="already in a transaction"):
            Transaction(a).__enter__()
    assert IcebergTable(str(tmp_path / "a")).to_df(spark).count() == 20
    assert IcebergTable(str(tmp_path / "b")).to_df(spark).count() == 7
