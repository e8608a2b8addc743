"""Shared statistics-entry plumbing for the raw-file-content blob
families (Bloom indexes, colsum blobs, per-file CDF partials, per-file
grouped theta partials).

Every incremental statistics refresh APPENDS one Puffin entry per run
(raw-file blobs are snapshot-independent, later-entries-win per file),
so without a bound the metadata ``statistics`` list and every probe's
footer walk grow O(refreshes ever).  Each family therefore repacks the
accumulated entries into ONE live-files-only entry past a threshold —
a pass that is identical across families except for how the family
rebuilds its blob payloads.  This module holds that one shared pass
(r13, unifying the three near-identical r12 consolidators) plus the
entry-dict constructor they all share.

Reference parity: none — the reference (``daskberg/ice.py``) reads
only data manifests and carries no statistics machinery at all.
"""

from __future__ import annotations

import os
import threading
import uuid
from typing import Any, Callable, Iterable

# every raw-file family consolidates past this many accumulated
# entries: late enough that steady-state refreshes stay append-only,
# early enough that the footer walk stays O(live files)
CONSOLIDATE_AFTER = 8

# Serializes every statistics commit tail (the read-modify-write of
# ``writer.statistics`` + ``writer.version`` + ``_write_metadata()``)
# so ``_maintain_statistics`` can overlap the independent family
# chains' Spark jobs (r15, guide §2.6) without lost-update races.  A
# single module-level lock rather than a per-writer attribute: commits
# are driver-side and millisecond-cheap (contention is irrelevant),
# and IcebergWriter stays pickle-clean.  Table DATA commits (append/
# delete/compact) never run concurrently with statistics refreshes —
# only the six statistics families overlap — so they stay unlocked.
STATS_COMMIT_LOCK = threading.RLock()


def stats_entry(path: str, metas: list[dict], snapshot_id: int) -> dict:
    """The spec-shaped ``statistics`` list entry for a written Puffin
    file (size/footer-size bookkeeping identical across families)."""
    size = os.path.getsize(path)
    return {
        "snapshot-id": snapshot_id,
        "statistics-path": path,
        "file-size-in-bytes": size,
        "file-footer-size-in-bytes": size
        - 4
        - sum(m["length"] for m in metas),
        "blob-metadata": metas,
    }


def consolidate_entries(
    writer,
    blob_types: Iterable[str],
    build_blobs: Callable[[int, int], list[dict[str, Any]]],
    name_prefix: str,
    salt: str = "",
    threshold: int = CONSOLIDATE_AFTER,
    commit: bool = True,
) -> bool:
    """Repack ALL statistics entries carrying any of ``blob_types``
    into ONE entry on the head snapshot when more than ``threshold``
    have accumulated.  ``build_blobs(snapshot_id, sequence_number)``
    returns the family's consolidated blob dicts (the family applies
    its own later-entry-wins merge and live-file restriction there —
    this pass never interprets payloads).  ``commit=False`` leaves the
    metadata write to the caller's own final commit (the quantile
    refreshes batch it with their histogram entry).  Returns True when
    a rewrite happened; False when under threshold or the family
    produced no blobs (nothing is dropped then)."""
    from daskberg_spark.iceberg.puffin import write_puffin

    types = set(blob_types)
    entries = [
        e
        for e in writer.statistics
        if any(b.get("type") in types for b in e.get("blob-metadata", []))
    ]
    if len(entries) <= threshold:
        return False
    snapshot_id = writer.head_snapshot["snapshot-id"]
    blobs = build_blobs(snapshot_id, writer._last_sequence_number)
    if not blobs:
        return False
    name = (
        f"{name_prefix}-consolidated-{snapshot_id}-"
        f"{uuid.uuid5(uuid.NAMESPACE_URL, f'{name_prefix}{snapshot_id}{salt}{len(entries)}{len(blobs)}').hex[:8]}"
        ".puffin"
    )
    path = f"{writer.path}/metadata/{name}"
    metas = write_puffin(path, blobs)
    drop = {id(e) for e in entries}
    with STATS_COMMIT_LOCK:
        # re-read inside the lock: another family's concurrent commit
        # may have replaced the list (its entries are of different
        # types, so the id()-keyed drop set stays valid)
        writer.statistics = [
            e for e in writer.statistics if id(e) not in drop
        ] + [stats_entry(path, metas, snapshot_id)]
        if commit:
            writer.version += 1
            writer._write_metadata()
    return True
