"""Structured Streaming SOURCE over the Iceberg connector — snapshot
tailing via the PySpark 4 Python Data Source API.

``spark.readStream.format("daskberg_iceberg").option("path", p).load()``
emits every committed append exactly once: offsets are snapshot ids,
``partitions(start, end)`` is the live-file diff between the two
snapshots (file-level — Iceberg appends are whole files), and each file
reads on an EXECUTOR as Arrow record batches.  This completes the
streaming pair with the epoch-keyed sink (``events.py::
iceberg_epoch_sink``): Iceberg table → stream → transform → Iceberg
table, all exactly-once.

Design notes for scale (and why a Python data source HERE, when the
batch path deliberately is not one — see README "Why metadata-planner +
native scan"): a streaming source must own offset bookkeeping, and
Spark's only extension hook for that from Python is this API.  The
driver-side work per micro-batch is a metadata diff (O(manifests));
row bytes move through Arrow batches on executors, one partition per
added file, so a micro-batch's parallelism is its file count.  Tailing
CDC-scale appends this is the right cost; full-history backfills
should batch-read ``to_df`` instead (JVM scan, pushdown) and start the
stream from the current snapshot.

Semantics: append snapshots only, like real Iceberg streaming reads —
a delete/overwrite/replace snapshot in the tailed range raises unless
``skip-non-append-snapshots`` is set (then their file changes are
ignored: rewritten files would re-emit rows the stream already
delivered).  The reference repo is read-only/batch-only and has no
counterpart.

``mode=cdc`` (BEYOND real Iceberg, whose streaming read is
append-only) turns non-append snapshots into row-level change batches:
every row carries ``_change_type`` ("insert"/"delete") and
``_commit_snapshot_id``.  EVERY delete flavor this engine reads also
streams: whole-file removals and deletion-vector commits stream
exactly (the one-DV-per-file invariant makes each file's prior dead
set ONE blob, so executors compute new-minus-prior locally from two
slim blob refs); EQUALITY-delete commits (the blind upsert / CDC-apply
shape) stream as ``eq_delta`` partitions — executors re-derive which
parent-live rows match the added keys, with sequence-correct
applicability, so an upsert's own inserts never match their own
delete; v2 POSITION-delete parquet streams as ``pos_delta``
partitions (executors filter the (file_path, pos) rows to their own
file, write-time paths relocated like the table layer); compaction
(``replace``) emits nothing per the upstream changelog-scan rule.
MOR UPDATE/MERGE arrive as delete+insert pairs.  A single commit
mixing delete flavors on ONE file raises toward the batch changelog
(overlapping newly-dead sets).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa

FORMAT_NAME = "daskberg_iceberg"

# synthetic columns CDC mode appends to the table schema
CDC_COLS = ("_change_type", "_commit_snapshot_id")


def _dv_ref(d: dict | None) -> tuple[str, int, int] | None:
    """Slim (path, offset, length) executor reference to a DV blob."""
    if d is None:
        return None
    return (
        d["file_path"],
        int(d["content_offset"]),
        int(d["content_size_in_bytes"]),
    )


class IcebergFilePartition(InputPartition):
    """One added data file: path + (rename map, target column order,
    per-column Arrow type) so executors resolve columns by FIELD ID
    exactly like the batch scan (`_read_file_groups`) — a renamed
    column's old files read under their write-time name, and columns
    ADDED after the file was written null-fill with the declared Arrow
    type (an untyped null array would mismatch the source schema the
    data-source worker enforces).

    CDC mode adds: ``change_type`` (None = plain append stream;
    "insert"/"delete" = emit the row-change columns), the committing
    snapshot id, and the DV blob references the executor needs to
    compute WHICH rows changed — ``kind`` selects the position set:

    - ``insert``: every row of the file;
    - ``delete_file``: every row still live at the parent snapshot
      (all positions minus the parent's DV blob for this file);
    - ``dv_delta``: positions in the commit's DV blob that are NOT in
      the parent's blob (the one-DV-per-file invariant makes the delta
      exactly new-minus-old);
    - ``eq_delta``: rows matching the commit's ADDED equality-delete
      keys (``new_eq``) that were still live at the parent — the blind
      upsert/CDC-apply write shape.

    ``prior_eq`` / ``new_eq`` are slim references
    ``(eq_parquet_path, then_names, current_names)``: the key columns
    under the names the delete file was WRITTEN with (resolved by field
    id through the delete snapshot's pinned schema, like the batch
    scan) and under today's names.  ``prior_eq`` lists the
    parent-live equality deletes applicable to this file (delete seq >
    file seq) — they extend the parent's dead set beyond the DV blob,
    so every delete-kind partition subtracts their matches too."""

    def __init__(
        self,
        path: str,
        renames: dict[str, str],
        columns: list[str],
        arrow_types: dict[str, Any],
        defaults: dict[str, Any] | None = None,
        change_type: str | None = None,
        snapshot_id: int | None = None,
        kind: str = "insert",
        new_dv: tuple[str, int, int] | None = None,
        prior_dv: tuple[str, int, int] | None = None,
        new_eq: list[tuple] | None = None,
        prior_eq: list[tuple] | None = None,
        new_pos: list[str] | None = None,
        prior_pos: list[str] | None = None,
        reloc: tuple[str, str] | None = None,
        file_format: str = "PARQUET",
        drops: list[str] | None = None,
    ) -> None:
        super().__init__(path)
        self.path = path
        self.file_format = file_format
        # physical columns DROPPED from the current schema: the
        # executor removes them before projection — a dropped-then-
        # re-added name would otherwise serve the dead column's stale
        # values under the new field id
        self.drops = drops or []
        self.renames = renames
        self.columns = columns
        self.arrow_types = arrow_types
        self.defaults = defaults or {}
        self.change_type = change_type
        self.snapshot_id = snapshot_id
        self.kind = kind
        self.new_dv = new_dv
        self.prior_dv = prior_dv
        self.new_eq = new_eq or []
        self.prior_eq = prior_eq or []
        # v2 position-delete parquet references: paths whose (file_path,
        # pos) rows the executor filters down to THIS data file —
        # ``reloc`` carries (original_url, actual_url) so write-time
        # target paths relocate the same way the table layer does
        self.new_pos = new_pos or []
        self.prior_pos = prior_pos or []
        self.reloc = reloc


def _read_stream_data_table(path: str, fmt: str = "PARQUET"):
    """Executor-side load of ONE data file as an arrow table, by
    ``file_format`` — the streaming twin of the batch layer's
    format-dispatched read (PARQUET/ORC via pyarrow; AVRO via the
    from-scratch container reader with Iceberg-Avro logical types
    restored)."""
    from daskberg_spark.iceberg.writer import _read_data_table

    return _read_data_table(
        {"file_path": path, "file_format": str(fmt or "PARQUET").upper()}
    )


def _added_manifests_by_snapshot(t, end_id: int) -> dict:
    """ONE manifest-list read (the end snapshot's) grouped by
    ``added_snapshot_id`` — the carried-manifest invariant makes this
    cover every ancestor's additions, turning backfill planning linear
    in history length."""
    t.open_snapshot(snapshot_id=end_id)
    by: dict = {}
    for mf in t.manifest_list:
        by.setdefault(mf.get("added_snapshot_id"), []).append(mf)
    return by


def _snapshot_added_manifests(t, sid: int, by_adder: dict) -> list:
    """Manifests ADDED by ``sid`` — from the end-list grouping when they
    survived to the end snapshot, else (a later rewrite consolidated
    them away) from the snapshot's own manifest list."""
    mfs = by_adder.get(sid)
    if mfs is not None:
        return mfs
    t.open_snapshot(snapshot_id=sid)
    return [
        mf
        for mf in t.manifest_list
        if mf.get("added_snapshot_id") == sid
    ]


class IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, declared_struct: Any = None) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("option 'path' (table location) is required")
        # the schema Spark resolved for the stream (fixed at query start)
        # — every emitted batch must conform to it, so it is the ONE
        # alignment target for renames/projection/types/defaults
        self._declared_struct = declared_struct
        self._target_schema: dict | None = None
        self.skip_non_append = str(
            options.get("skip-non-append-snapshots", "false")
        ).lower() in ("true", "1")
        # CDC/changelog mode: non-append snapshots become row-level
        # change batches instead of errors; every row carries
        # _change_type + _commit_snapshot_id
        self.cdc = str(options.get("mode", "")).lower() in (
            "cdc",
            "changelog",
        )
        self.from_beginning = str(
            options.get("from-beginning", "true")
        ).lower() in ("true", "1")
        # tail a named branch instead of main (real Iceberg's streaming
        # `branch` read option): offsets resolve against the ref's head,
        # so a WAP-staged branch streams its staged commits while main
        # stays pinned
        self.branch = options.get("branch")
        mft = options.get("max-files-per-trigger")
        self.max_files_per_trigger = int(mft) if mft is not None else None
        self._rate_end: int | None = None  # last rate-limited latestOffset
        # furthest start offset Spark has handed partitions() — the
        # restart-safe floor for the rate-limit cursor (the in-memory
        # _rate_end dies with the driver; the checkpointed start does
        # not).
        self._committed_start: int | None = None

    # -- driver-side metadata ------------------------------------------------

    def _table(self):
        from daskberg_spark.iceberg.metadata import IcebergTable

        return IcebergTable(self.path)

    def _resolve_target_schema(self, t) -> dict:
        """The Iceberg schema matching the stream's DECLARED struct —
        resolved once and cached for the query's lifetime.  The declared
        struct is fixed at query start, so a rename landing mid-stream
        (or an older end snapshot under ``max-files-per-trigger``) must
        still align every file to the DECLARED names by field id; using
        the head/end snapshot's schema instead would emit batches whose
        column names mismatch the schema the data-source worker
        enforces."""
        if self._target_schema is not None:
            return self._target_schema
        sch = t.schema
        if self._declared_struct is not None:
            declared = [f.name for f in self._declared_struct.fields]
            # CDC mode appends synthetic change columns to the declared
            # struct; the Iceberg-schema match is on the data columns
            declared = [n for n in declared if n not in CDC_COLS]
            if [f["name"] for f in sch["fields"]] != declared:
                # NEWEST matching schema wins: a type promotion produces
                # two schemas with identical name lists, and the declared
                # struct (resolved at stream start, i.e. from the newest)
                # carries the WIDE types — matching the oldest would hand
                # the worker narrow Arrow arrays it rejects
                for s in reversed(t.metadata.get("schemas", [])):
                    if [f["name"] for f in s["fields"]] == declared:
                        sch = s
                        break
        self._target_schema = sch
        return sch

    def _head_id(self, t) -> int | None:
        """The tailed head: a named branch's referenced snapshot when
        the ``branch`` option is set, else the table head — None for a
        created-but-empty table (current-snapshot-id = -1): the stream
        idles until the first commit instead of crashing."""
        if self.branch is None:
            try:
                return t.current_snapshot["snapshot-id"]
            except ValueError:
                return None
        refs = t.metadata.get("refs") or {}
        if self.branch not in refs:
            raise ValueError(
                f"no ref {self.branch!r} in table metadata "
                f"(refs: {sorted(refs)})"
            )
        return refs[self.branch]["snapshot-id"]

    def initialOffset(self) -> dict:
        if self.from_beginning:
            return {"snapshot_id": None}  # pre-table-history: emit all
        return {"snapshot_id": self._head_id(self._table())}

    def latestOffset(self) -> dict:
        """Head snapshot — or, under ``max-files-per-trigger``, the
        furthest ancestor whose cumulative added-file count (manifest
        list ``added_data_files_count``, metadata-only) stays within the
        budget, so a 100k-file backfill becomes bounded micro-batches
        instead of one giant one (the knob real Iceberg streaming calls
        ``max-files-per-micro-batch``).  At least one snapshot always
        advances.  The cursor is in-memory, floored by the last PLANNED
        batch end (which Spark replays from the checkpoint), so from
        the first ``partitions`` call onward the budget can never emit
        an offset behind the stream.  Residual corner, documented: a
        cold RESTART whose very first call is ``latestOffset`` budgets
        from scratch — that one offset can land behind the checkpoint,
        Spark commits it, and the window between it and the checkpoint
        re-delivers once (the ancestor path heals the cursor
        immediately after).  The Python streaming API offers no
        start-aware ``latestOffset`` to close this."""
        t = self._table()
        head = self._head_id(t)
        if head is None:
            return {"snapshot_id": None}
        if self.max_files_per_trigger is None:
            return {"snapshot_id": head}
        base = self._rate_end
        if base is None:
            base = self._committed_start
        if base is None:
            base = self.initialOffset()["snapshot_id"]
        if base == head:
            return {"snapshot_id": head}
        chain = []
        snap = t.snapshots.get(head)
        while snap is not None and snap["snapshot-id"] != base:
            chain.append(snap)
            parent = snap.get("parent-snapshot-id")
            snap = t.snapshots.get(parent) if parent is not None else None
        chain.reverse()
        by_adder = _added_manifests_by_snapshot(t, head)
        remaining = self.max_files_per_trigger
        chosen = base
        for s in chain:
            sid = s["snapshot-id"]
            n = sum(
                mf.get("added_data_files_count") or 0
                for mf in _snapshot_added_manifests(t, sid, by_adder)
            )
            if chosen != base and n > remaining:
                break
            remaining -= n
            chosen = sid
            if remaining <= 0:
                break
        self._rate_end = chosen
        return {"snapshot_id": chosen}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        """One partition per file ADDED by each APPEND snapshot in
        (start, end] — read from each snapshot's OWN manifests, never a
        live-set diff: a compaction committed after an undelivered
        append must not hide it (the rewrite removes the append's files
        from the live set, but its rows were never emitted — a live-diff
        would silently lose them).  The appended files stay on disk
        until ``remove_orphan_files``, so the only delivery hazard is
        running the orphan sweep ahead of a badly lagging stream."""
        t = self._table()
        target_schema = self._resolve_target_schema(t)
        end_id = end["snapshot_id"]
        start_id = start.get("snapshot_id")
        if end_id == start_id:
            return []
        chain = []  # (start, end], oldest first after reverse
        snap = t.snapshots.get(end_id)
        if snap is None:
            # the checkpointed end of a replayed batch has been EXPIRED
            # — silently returning [] would drop the whole batch
            raise ValueError(
                f"offset snapshot {end_id} no longer exists (expired); "
                "restart the stream from a fresh checkpoint"
            )
        reached_start = False
        while snap is not None and snap["snapshot-id"] != start_id:
            chain.append(snap)
            parent = snap.get("parent-snapshot-id")
            if parent is None:
                if start_id is not None:
                    # a rate-limited cursor re-advancing after restart can
                    # hand us an END that is an ANCESTOR of start — an
                    # empty batch, not an error
                    walk = t.snapshots.get(start_id)
                    while walk is not None:
                        if walk["snapshot-id"] == end_id:
                            # heal the regressed in-memory cursor: the
                            # next budget walk starts at the REAL
                            # frontier instead of re-covering it
                            self._rate_end = start_id
                            self._committed_start = start_id
                            return []
                        wp = walk.get("parent-snapshot-id")
                        walk = t.snapshots.get(wp) if wp is not None else None
                    raise ValueError(
                        f"offset snapshot {start_id} is not an ancestor of "
                        f"{end_id} (rollback or expire moved the lineage); "
                        "restart the stream from a fresh checkpoint"
                    )
                reached_start = True  # walked to the table root (start=None)
                break
            snap = t.snapshots.get(parent)
        if snap is not None and snap.get("snapshot-id") == start_id:
            reached_start = True  # loop ended AT the start offset
        if start_id is None:
            # from-beginning: a dangling parent is the table's history
            # HORIZON (expire_snapshots keeps the oldest retained
            # snapshot's parent pointer) — stream the retained suffix
            reached_start = True
        if not reached_start:
            # a parent in (start, end] has been EXPIRED: the chain is
            # INCOMPLETE — emitting the partial batch would silently
            # lose the expired ancestors' rows (exactly-once violation)
            raise ValueError(
                f"lineage between offsets {start_id} and {end_id} has "
                "expired snapshots; restart the stream from a fresh "
                "checkpoint (and keep expire_snapshots behind the "
                "stream's lag)"
            )
        # the planned END survives as the next batch's start (Spark
        # replays offsets from the checkpoint) — it floors the
        # in-memory rate cursor across restarts
        self._committed_start = end_id
        chain.reverse()
        bad = {
            s["snapshot-id"]
            for s in chain
            if (s.get("summary") or {}).get("operation", "append") != "append"
        }
        if bad and not self.skip_non_append and not self.cdc:
            raise ValueError(
                f"non-append snapshots {sorted(bad)} in streamed range; "
                "set skip-non-append-snapshots=true to ignore their file "
                "changes (rewritten files would re-emit delivered rows), or "
                "mode=cdc to stream them as row-level changes"
            )
        # LINEAR backfill planning: manifests are carried forward across
        # commits with their added_snapshot_id intact, so ONE read of the
        # END snapshot's manifest list yields every chain snapshot's
        # added manifests — walking each snapshot's own list is
        # O(history²) in manifest records (snapshot k's list carries k
        # entries).  A non-append snapshot LATER in the range may have
        # rewritten an append's manifests only PARTIALLY (a CoW merge
        # rewrites the manifest containing the matched file; sibling
        # manifests carry forward), so any snapshot with a rewrite after
        # it takes the per-snapshot fallback — the grouped end list
        # cannot prove completeness for it.  Append-only histories stay
        # fully linear.
        by_adder = _added_manifests_by_snapshot(t, end_id)
        # ONE schema governs the whole batch: the DECLARED one, resolved
        # above BEFORE any open_snapshot — t.schema is stateful, and the
        # own-list fallback below re-opens OLDER snapshots, so reading
        # t.schema inside the loop would align later files against a
        # stale schema (a rename then silently null-fills the renamed
        # column for every row of those files).
        current_names = [f["name"] for f in target_schema["fields"]]
        from daskberg_spark.iceberg.conversions import iceberg_to_arrow_type

        try:
            arrow_types = {
                f["name"]: iceberg_to_arrow_type(f["type"])
                for f in target_schema["fields"]
            }
        except NotImplementedError as ex:
            # e.g. v3 variant: the Python Data Source worker cannot ship
            # such columns as Arrow batches — fail at PLAN time with the
            # alternative, not as an opaque worker error
            raise NotImplementedError(
                f"streaming this table is unsupported ({ex}); use the "
                "batch scan (to_df) or the batch changelog"
            ) from None
        defaults = {
            f["name"]: f["initial-default"]
            for f in target_schema["fields"]
            if f.get("initial-default") is not None
        }
        rewritten_after: set[int] = set()
        seen_rewrite = False
        for s in reversed(chain):
            if seen_rewrite:
                rewritten_after.add(s["snapshot-id"])
            if (s.get("summary") or {}).get("operation", "append") != "append":
                seen_rewrite = True
        parts: list[InputPartition] = []
        for s in chain:
            sid = s["snapshot-id"]
            if sid in bad:
                if self.cdc:
                    parts.extend(
                        self._cdc_partitions(
                            t, s, target_schema, current_names,
                            arrow_types, defaults,
                        )
                    )
                continue
            if sid in rewritten_after:
                by_adder.pop(sid, None)  # force the own-list fallback
            from daskberg_spark.iceberg.scan import schema_alignment

            renames, drops, _missing = schema_alignment(
                t.schema_for_snapshot(sid), target_schema
            )
            for mf in _snapshot_added_manifests(t, sid, by_adder):
                for e in t._load_manifest(t._relocate(mf["manifest_path"])):
                    rec = e["data_file"]
                    entry_snap = (
                        e.get("snapshot_id")
                        if e.get("snapshot_id") is not None
                        else sid
                    )
                    if (
                        e["status"] == 1
                        and rec.get("content", 0) == 0
                        and entry_snap == sid
                    ):
                        parts.append(
                            IcebergFilePartition(
                                t._relocate(rec["file_path"]),
                                renames,
                                current_names,
                                arrow_types,
                                defaults,
                                change_type="insert" if self.cdc else None,
                                snapshot_id=sid if self.cdc else None,
                                file_format=rec.get(
                                    "file_format", "PARQUET"
                                ),
                                drops=drops,
                            )
                        )
        return parts

    def _cdc_partitions(
        self,
        t,
        s: dict,
        target_schema: dict,
        current_names: list[str],
        arrow_types: dict,
        defaults: dict,
    ) -> list[InputPartition]:
        """Row-level change partitions for one NON-APPEND snapshot.

        Scope: every delete flavor the engine reads — whole-file
        removals (CoW merge, delete_files, dynamic overwrite),
        deletion-vector commits (MOR delete/merge/update),
        EQUALITY-delete commits (blind upsert / CDC apply: added keys
        stream as ``eq_delta`` partitions against each parent-live file
        they apply to), and v2 POSITION-delete parquet (``pos_delta``
        partitions; targets from a column-pruned delta-sized driver
        read).  A ``replace`` (compaction) emits NOTHING, the upstream
        changelog-scan rule — rewritten bytes are not logical changes;
        a commit mixing delete flavors on one file raises toward the
        batch changelog.

        Correctness against prior deletes: the parent's dead set for a
        file is its single DV blob (the one-DV-per-file invariant the
        writer maintains) UNION the matches of parent-live equality
        deletes applicable to it (``prior_eq``, sequence-gated) — every
        delete-kind partition subtracts both, computed executor-side
        from slim references only."""
        from daskberg_spark.iceberg.scan import schema_alignment

        sid = s["snapshot-id"]
        if (s.get("summary") or {}).get("operation") == "replace":
            return []
        pid = s.get("parent-snapshot-id")
        if pid is not None and pid in t.snapshots:
            t.open_snapshot(snapshot_id=pid)
            p_data, p_del = t.scan_all()
        else:
            p_data, p_del = {}, {}
        t.open_snapshot(snapshot_id=sid)
        c_data, c_del = t.scan_all()

        def is_dv(d: dict) -> bool:
            # PUFFIN format required, matching metadata.scan_all's rule:
            # the spec lets a v2 PARQUET position-delete file carry
            # referenced_data_file too (single-target files) — treating
            # it as a DV blob would int(None) on content_offset
            return bool(
                (d.get("file_format") or "").upper() == "PUFFIN"
                and d.get("content") == 1
                and d.get("referenced_data_file")
            )

        # every delete flavor this engine reads also streams: DV commits
        # as blob deltas, EQUALITY deletes as ``eq_delta`` partitions
        # (added keys) / ``prior_eq`` refs (parent-live), and v2
        # POSITION-delete parquet as ``pos_delta`` partitions (added) /
        # ``prior_pos`` refs (parent-live) — executors filter the
        # (file_path, pos) rows down to their own file, relocating
        # write-time target paths like the table layer does.
        def is_pos(d: dict) -> bool:
            return bool(d.get("content") == 1 and not is_dv(d))

        # per-TARGET pruning of parent position-delete parquet: one
        # column-pruned driver read per delete file (delta-sized) builds
        # a target → [paths] map, so each executor partition reads only
        # the delete files that actually name it — shipping the full
        # list made every delete-kind partition re-read every
        # accumulated pos-delete file
        prior_pos_by_target: dict[str, list[str]] = {}
        for d in sorted(
            (d for d in p_del.values() if is_pos(d)),
            key=lambda d: d["file_path"],
        ):
            import pyarrow.parquet as _ppq

            for raw in (
                _ppq.read_table(d["file_path"], columns=["file_path"])
                .column("file_path")
                .unique()
                .to_pylist()
            ):
                prior_pos_by_target.setdefault(
                    t._relocate(str(raw)), []
                ).append(d["file_path"])

        def prior_pos_for(target: str) -> list[str]:
            return prior_pos_by_target.get(target, [])
        new_pos_files = [
            d for k, d in c_del.items() if is_pos(d) and k not in p_del
        ]
        reloc = (t.original_url, t.url)
        p_dv = {
            d["referenced_data_file"]: d for d in p_del.values() if is_dv(d)
        }
        c_dv = {
            d["referenced_data_file"]: d for d in c_del.values() if is_dv(d)
        }

        # equality-delete refs: (path, then_names, current_names), with
        # then_names resolved by FIELD ID through the delete snapshot's
        # pinned schema (rename-safe, like the batch scan's resolution)
        # and current_names in the stream's declared-schema space.
        now_by_id = {
            f.get("id", f.get("field-id")): f["name"]
            for f in target_schema["fields"]
        }
        use_seq = t.metadata.get("format-version", 1) >= 2

        def _seq(rec: dict) -> int:
            if use_seq:
                s_ = rec.get("_sequence_number")
                return 0 if s_ is None else int(s_)
            return int(rec.get("_snapshot_id") or 0)

        def _eq_ref(d: dict) -> tuple:
            from daskberg_spark.iceberg.scan import _scope_tuple

            if _scope_tuple(t, d) is not None:
                # partition-scoped eq delete (foreign Flink-style writer
                # on a partitioned table): the slim refs here apply keys
                # globally, which would over-delete other partitions —
                # defer to the batch changelog, which partition-gates.
                # (The scan's globality rule applies: unpartitioned spec
                # or an all-None tuple — this engine's own global shape
                # through a partitioned-spec manifest — streams fine.)
                raise NotImplementedError(
                    "CDC streaming applies equality deletes globally; "
                    f"snapshot {sid} touches a PARTITION-SCOPED equality "
                    "delete — read this window with the batch changelog "
                    "(changelog_rows_df)"
                )
            then_schema = t.schema_for_snapshot(d.get("_snapshot_id"))
            then_by_id = {
                f.get("id", f.get("field-id")): f["name"]
                for f in then_schema["fields"]
            }
            ids = d["equality_ids"]
            missing = [
                i for i in ids if i not in now_by_id or i not in then_by_id
            ]
            if missing:
                # key column dropped since (or absent from the pinned
                # delete-time schema): a bare KeyError would point
                # nowhere — fail like the function's other unsupported
                # shapes, toward the batch changelog
                raise NotImplementedError(
                    f"equality delete {d['file_path']} keys on field "
                    f"id(s) {missing} that no longer resolve in the "
                    "declared schema — read this window with the batch "
                    "changelog (changelog_rows_df)"
                )
            return (
                t._relocate(d["file_path"]),
                tuple(then_by_id[i] for i in ids),
                tuple(now_by_id[i] for i in ids),
            )

        p_eq = [d for d in p_del.values() if d.get("content") == 2]
        new_eq = [
            d
            for k, d in c_del.items()
            if d.get("content") == 2 and k not in p_del
        ]

        def prior_eq_for(file_rec: dict) -> list[tuple]:
            fseq = _seq(file_rec)
            return [_eq_ref(d) for d in p_eq if _seq(d) > fseq]

        align_cache: dict[int | None, tuple] = {}

        def _align(fsnap: int | None) -> tuple:
            if fsnap not in align_cache:
                r, drops, _missing = schema_alignment(
                    t.schema_for_snapshot(fsnap), target_schema
                )
                align_cache[fsnap] = (r, drops)
            return align_cache[fsnap]

        def renames_for(fsnap: int | None) -> dict[str, str]:
            return _align(fsnap)[0]

        def drops_for(fsnap: int | None) -> list[str]:
            return _align(fsnap)[1]

        parts: list[InputPartition] = []
        removed = sorted(f for f in p_data if f not in c_data)
        added = sorted(f for f in c_data if f not in p_data)
        for f in removed:
            parts.append(
                IcebergFilePartition(
                    f,
                    renames_for(p_data[f].get("_snapshot_id")),
                    current_names,
                    arrow_types,
                    defaults,
                    change_type="delete",
                    snapshot_id=sid,
                    kind="delete_file",
                    prior_dv=_dv_ref(p_dv.get(f)),
                    prior_eq=prior_eq_for(p_data[f]),
                    prior_pos=prior_pos_for(f),
                    reloc=reloc,
                    file_format=p_data[f].get("file_format", "PARQUET"),
                    drops=drops_for(p_data[f].get("_snapshot_id")),
                )
            )
        # targets of THIS commit's position deletes — needed before the
        # insert loop: a pos delete (no sequence gate, it names files
        # explicitly) and a DV added in the SAME commit as their target
        # file kill rows that must never stream as inserts
        new_pos_paths: list[str] = []
        pos_targets: set[str] = set()
        if new_pos_files:
            import pyarrow.parquet as pq

            new_pos_paths = sorted(d["file_path"] for d in new_pos_files)
            for path_ in new_pos_paths:
                for raw in (
                    pq.read_table(path_, columns=["file_path"])
                    .column("file_path")
                    .unique()
                    .to_pylist()
                ):
                    pos_targets.add(t._relocate(str(raw)))
        for f in added:
            parts.append(
                IcebergFilePartition(
                    f,
                    renames_for(c_data[f].get("_snapshot_id")),
                    current_names,
                    arrow_types,
                    defaults,
                    change_type="insert",
                    snapshot_id=sid,
                    kind="insert",
                    # same-commit deletes targeting the new file: rows
                    # dead on arrival are excluded from the insert
                    prior_dv=_dv_ref(c_dv.get(f)),
                    prior_pos=new_pos_paths if f in pos_targets else [],
                    reloc=reloc,
                    file_format=c_data[f].get("file_format", "PARQUET"),
                    drops=drops_for(c_data[f].get("_snapshot_id")),
                )
            )
        dv_changed: set[str] = set()
        for f in sorted(c_dv):
            if f not in c_data or f not in p_data:
                continue  # target added this commit or already removed
            new_ref = _dv_ref(c_dv[f])
            prior_ref = _dv_ref(p_dv.get(f))
            if new_ref == prior_ref:
                continue  # blob carried forward unchanged
            dv_changed.add(f)
            parts.append(
                IcebergFilePartition(
                    f,
                    renames_for(c_data[f].get("_snapshot_id")),
                    current_names,
                    arrow_types,
                    defaults,
                    change_type="delete",
                    snapshot_id=sid,
                    kind="dv_delta",
                    new_dv=new_ref,
                    prior_dv=prior_ref,
                    prior_eq=prior_eq_for(c_data[f]),
                    prior_pos=prior_pos_for(f),
                    reloc=reloc,
                    file_format=c_data[f].get("file_format", "PARQUET"),
                    drops=drops_for(c_data[f].get("_snapshot_id")),
                )
            )
        pos_changed: set[str] = set()
        if new_pos_files:
            # ADDED position-delete parquet: one pos_delta partition per
            # parent-live target (targets computed above); executors
            # re-read the pairs and keep their own file's
            # new-minus-prior positions.  Targets added this same
            # commit already excluded their dead rows from the insert
            # partition; targets already gone emit nothing.
            for f in sorted(pos_targets):
                if f not in c_data or f not in p_data:
                    continue  # target gone, or added this same commit
                if f in dv_changed:
                    raise NotImplementedError(
                        f"snapshot {sid} adds BOTH a deletion vector and "
                        f"position deletes for {f}; their newly-dead sets "
                        "may overlap — read this window with the batch "
                        "changelog (changelog_rows_df)"
                    )
                pos_changed.add(f)
                parts.append(
                    IcebergFilePartition(
                        f,
                        renames_for(c_data[f].get("_snapshot_id")),
                        current_names,
                        arrow_types,
                        defaults,
                        change_type="delete",
                        snapshot_id=sid,
                        kind="pos_delta",
                        prior_dv=_dv_ref(p_dv.get(f)),
                        prior_eq=prior_eq_for(c_data[f]),
                        new_pos=new_pos_paths,
                        prior_pos=prior_pos_for(f),
                        reloc=reloc,
                        file_format=c_data[f].get(
                            "file_format", "PARQUET"
                        ),
                        drops=drops_for(c_data[f].get("_snapshot_id")),
                    )
                )
        if new_eq:
            # ADDED equality deletes (blind upsert / CDC apply): one
            # eq_delta partition per parent-live file the deletes apply
            # to (delete seq > file seq — same-commit data files are
            # excluded by construction, so an upsert's own inserts
            # never match their own delete).  Executors compute
            # matches(new keys) − parent dead set from the slim refs.
            added_set = set(added)
            for f in sorted(c_data):
                if f in added_set or f not in p_data:
                    continue
                fseq = _seq(c_data[f])
                refs = [_eq_ref(d) for d in new_eq if _seq(d) > fseq]
                if not refs:
                    continue
                if f in dv_changed or f in pos_changed:
                    raise NotImplementedError(
                        f"snapshot {sid} adds BOTH equality deletes and "
                        f"another delete flavor applicable to {f}; their "
                        "newly-dead sets may overlap — read this window "
                        "with the batch changelog (changelog_rows_df)"
                    )
                parts.append(
                    IcebergFilePartition(
                        f,
                        renames_for(c_data[f].get("_snapshot_id")),
                        current_names,
                        arrow_types,
                        defaults,
                        change_type="delete",
                        snapshot_id=sid,
                        kind="eq_delta",
                        prior_dv=_dv_ref(p_dv.get(f)),
                        new_eq=refs,
                        prior_eq=prior_eq_for(c_data[f]),
                        prior_pos=prior_pos_for(f),
                        reloc=reloc,
                        file_format=c_data[f].get(
                            "file_format", "PARQUET"
                        ),
                        drops=drops_for(c_data[f].get("_snapshot_id")),
                    )
                )
        return parts

    # -- executor-side read --------------------------------------------------

    def read(self, partition: InputPartition) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa
        import pyarrow.parquet as pq

        assert isinstance(partition, IcebergFilePartition)
        tbl = _read_stream_data_table(
            partition.path, getattr(partition, "file_format", "PARQUET")
        )
        stale = [
            c
            for c in getattr(partition, "drops", [])
            if c in tbl.column_names
        ]
        if stale:
            # columns DROPPED from the current schema: remove them
            # before projection — a re-added name would otherwise serve
            # the dead column's stale values under the new field id
            tbl = tbl.drop_columns(stale)
        if (
            partition.kind != "insert"
            or partition.prior_dv is not None
            or partition.prior_eq
            or partition.prior_pos
        ):
            # CDC delete partitions: select WHICH positions changed from
            # slim references only — DV blobs decode and equality-delete
            # key parquet reads happen here on the executor, never on
            # the driver
            from daskberg_spark.iceberg.puffin import dv_decode_file

            def eq_matches(refs: list[tuple]) -> set[int]:
                """Positions of rows matching ANY key in the referenced
                equality-delete files.  Null-safe (a NULL key matches
                NULL values, per spec); data columns resolve through the
                file's write-time names, with v3 initial-defaults for
                columns the file predates."""
                dead: set[int] = set()
                inv = {v: k for k, v in partition.renames.items()}
                for path, then_names, cur_names in refs:
                    ktbl = pq.read_table(path)
                    # ALL-or-nothing resolution (the batch rule): read
                    # keys by write-time name when EVERY key resolves,
                    # else fall back to positional alignment in
                    # equality_ids order for the WHOLE file.  Per-column
                    # mixing could pick the same physical column twice
                    # when names partially overlap — silently wrong
                    # deletes instead of a loud failure.
                    by_name = all(
                        n in ktbl.column_names for n in then_names
                    )
                    if not by_name and (
                        any(n in ktbl.column_names for n in then_names)
                        or len(then_names) > ktbl.num_columns
                    ):
                        raise NotImplementedError(
                            f"equality-delete file {path} matches the "
                            f"pinned key names {list(then_names)} only "
                            "partially; alignment is ambiguous — read "
                            "this window with the batch changelog "
                            "(changelog_rows_df)"
                        )
                    key_cols = [
                        ktbl.column(n if by_name else i).to_pylist()
                        for i, n in enumerate(then_names)
                    ]
                    key_set = set(zip(*key_cols))
                    cols = []
                    for c in cur_names:
                        fc = inv.get(c, c)
                        if fc in tbl.column_names:
                            cols.append(tbl.column(fc).to_pylist())
                        else:
                            fill = partition.defaults.get(c)
                            cols.append([fill] * len(tbl))
                    for i, row in enumerate(zip(*cols)):
                        if row in key_set:
                            dead.add(i)
                return dead

            def pos_matches(paths: list[str]) -> set[int]:
                """Positions this data file loses to the referenced
                position-delete parquet: filter each file's (file_path,
                pos) rows to OUR path, relocating write-time targets
                the way the table layer does (scheme strip + original →
                actual prefix)."""
                from daskberg_spark.iceberg.metadata import _strip_scheme

                orig, actual = partition.reloc or ("", "")
                dead: set[int] = set()
                for p_ in paths:
                    ptbl = pq.read_table(p_, columns=["file_path", "pos"])
                    for fp, po in zip(
                        ptbl.column("file_path").to_pylist(),
                        ptbl.column("pos").to_pylist(),
                    ):
                        fp = _strip_scheme(str(fp))
                        # boundary-checked like metadata._relocate:
                        # '/old/tbl' must not rewrite '/old/tbl_backup'
                        if orig and (
                            fp == orig
                            or fp.startswith(orig.rstrip("/") + "/")
                        ):
                            fp = actual + fp[len(orig):]
                        if fp == partition.path:
                            dead.add(int(po))
                return dead

            prior: set[int] = set()
            if partition.prior_dv is not None:
                prior = set(dv_decode_file(*partition.prior_dv))
            if partition.prior_eq:
                prior |= eq_matches(partition.prior_eq)
            if partition.prior_pos:
                prior |= pos_matches(partition.prior_pos)
            if partition.kind == "dv_delta":
                assert partition.new_dv is not None
                new = set(dv_decode_file(*partition.new_dv))
                positions = sorted(new - prior)
            elif partition.kind == "eq_delta":
                positions = sorted(eq_matches(partition.new_eq) - prior)
            elif partition.kind == "pos_delta":
                positions = sorted(pos_matches(partition.new_pos) - prior)
            else:
                # delete_file: rows still live at the parent snapshot;
                # insert-with-prior: a file ADDED alongside same-commit
                # deletes targeting it — rows dead on arrival never
                # stream.  Same formula: everything minus the dead set.
                positions = [i for i in range(len(tbl)) if i not in prior]
            # explicit index type: an EMPTY delta otherwise infers a
            # null-typed indices array pyarrow's take has no kernel for
            tbl = tbl.take(pa.array(positions, type=pa.int64()))
        if partition.renames:
            tbl = tbl.rename_columns(
                [partition.renames.get(n, n) for n in tbl.column_names]
            )
        # project to the current schema's order; columns added after the
        # file was written null-fill with the DECLARED Arrow type, and
        # written-as-narrower columns (legal promotion, e.g. int→long)
        # cast up to it — the data-source worker enforces the source
        # schema on yielded batches
        arrays = []
        for name in partition.columns:
            expected = partition.arrow_types[name]
            if name in tbl.column_names:
                col = tbl.column(name)
                if col.type != expected:
                    col = col.cast(expected)
                arrays.append(col)
            elif name in partition.defaults:
                # v3 initial-default: pre-column files read the default
                arrays.append(
                    pa.array(
                        [partition.defaults[name]] * len(tbl)
                    ).cast(expected)
                )
            else:
                arrays.append(pa.nulls(len(tbl), type=expected))
        out = pa.table(dict(zip(partition.columns, arrays)))
        if partition.change_type is not None:
            out = out.append_column(
                "_change_type",
                pa.array([partition.change_type] * len(out), type=pa.string()),
            ).append_column(
                "_commit_snapshot_id",
                pa.array([partition.snapshot_id] * len(out), type=pa.int64()),
            )
        yield from out.to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream checkpoint; nothing to ack

    def stop(self) -> None:
        pass


class IcebergStreamDataSource(DataSource):
    """``spark.dataSource.register(IcebergStreamDataSource)`` then
    ``spark.readStream.format("daskberg_iceberg")``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> Any:
        from pyspark.sql import types as T

        from daskberg_spark.iceberg.conversions import schema_to_struct
        from daskberg_spark.iceberg.metadata import IcebergTable

        path = self.options.get("path")
        if not path:
            raise ValueError("option 'path' (table location) is required")
        t = IcebergTable(path)
        if self.options.get("branch"):
            # the stream's declared schema is the BRANCH head's (a
            # staged schema change must govern its own stream)
            t.open_snapshot(ref=self.options["branch"])
        struct = schema_to_struct(t.schema)
        if str(self.options.get("mode", "")).lower() in ("cdc", "changelog"):
            struct = T.StructType(
                list(struct.fields)
                + [
                    T.StructField("_change_type", T.StringType(), False),
                    T.StructField("_commit_snapshot_id", T.LongType(), False),
                ]
            )
        return struct

    def streamReader(self, schema) -> IcebergStreamReader:
        return IcebergStreamReader(dict(self.options), schema)


def register(spark) -> None:
    """Idempotently register the streaming source with a session."""
    spark.dataSource.register(IcebergStreamDataSource)
