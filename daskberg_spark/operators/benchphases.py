"""Per-phase wall-clock accounting for LIFECYCLE bench entries.

Lifecycle queries (rollup/join-rollup/quantile/NDV maintenance) build
their fixture inside the query — appends, deletes, materialization —
then exercise the engine operation being benched (the refresh).  When
a round legitimately grows a lifecycle (r12 added an SCD dim-update
window to ``iceberg_join_rollup``), the bench's name-to-name control
ratio compares DIFFERENT workloads and flags a phantom regression that
has needed a manual SCALING.md exoneration three rounds running (r12
verdict item 4).  This module gives ``bench.py`` the split it needs to
compare like-for-like automatically: queries wrap their steps in
``phase(query, label)``, and the control comparison uses the
``refresh`` label alone — the build is fixture cost, not engine cost.

Overhead is two ``perf_counter`` calls per phase (~100 ns) against
multi-second phases; the accounting is a no-op for queries that never
call it.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

# {query_name: {label: accumulated_seconds}}
PHASES: dict[str, dict[str, float]] = {}


def reset(query: str | None = None) -> None:
    """Drop accumulated timings (one query's, or all)."""
    if query is None:
        PHASES.clear()
    else:
        PHASES.pop(query, None)


@contextmanager
def phase(query: str, label: str):
    """Accumulate this block's wall time under (query, label).
    Repeated blocks with one label sum — ``refresh`` then reads as
    total refresh seconds per lifecycle run."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        d = PHASES.setdefault(query, {})
        d[label] = d.get(label, 0.0) + time.perf_counter() - t0


def snapshot(query: str) -> dict[str, float] | None:
    """A copy of one query's accumulated phases, or None."""
    d = PHASES.get(query)
    return dict(d) if d else None
