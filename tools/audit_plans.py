"""Physical-plan audit: assert the plans we'd want at 100 TB.

For each audited query: does the parquet scan carry PushedFilters?  Is the
ReadSchema pruned to the referenced columns?  Did small dims broadcast?
How many shuffles (Exchange) does the plan contain?  Prints a compact
report; run after changing any operator.

Usage: python tools/audit_plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

AUDIT = {
    # query: (max_exchanges, expect_pushed_filter, expect_broadcast, max_read_cols)
    "q1_pricing_summary": (1, True, False, 7),
    "filter_project": (0, True, False, 5),
    "distinct_values": (1, False, False, 2),  # no predicate → nothing to push
    "group_count": (1, False, False, 1),
    "join_multi": (6, True, True, None),
    "join_left": (3, False, False, 3),
    "topk_orders": (1, False, False, 3),
    "window_rank": (1, False, False, 3),
    "events_sessionize": (1, False, False, 3),
    "dedup_exact": (1, False, False, 2),
    "similarity_topk": (2, True, True, 2),
    "text_stats": (1, False, False, 4),
    "q3_shipping_priority": (5, True, False, None),
    "q6_forecast_revenue": (1, True, False, 4),
    "asof_join": (1, True, False, 4),
    "merge_upsert": (2, True, False, 4),
    "dedup_ngram_jaccard": (6, False, False, 4),
    "q4_order_priority": (3, False, False, 3),
    "q10_returned_items": (6, True, True, None),
    "q14_promo_effect": (1, False, True, 4),
    "q18_large_volume": (6, False, False, None),
    "window_distribution_partitioned": (1, False, False, 3),
    # round 6 single-anti-join MOR shape: ONE tagged scan, broadcast
    # file→sequence map, one sequence-keyed eq-delete anti-join per
    # distinct key-column set (delete keys groupBy-max = 1 exchange) +
    # pos-delete anti-join + final agg exchange.  Plan size is FLAT in
    # #delete-commits (was one union leg per applicability class).
    "iceberg_v2_row_deletes": (3, False, True, None),
    # foreign-written v2: same single-anti-join shape; no residual
    # predicate to push
    "iceberg_foreign_read": (2, False, True, None),
    # distributed merge-on-read deletes: delete-key groupBy-max, distinct
    # for the position-delete pairs, broadcast anti-joins, final group agg
    "iceberg_mor_delete_read": (3, False, True, None),
    # v3 deletion-vector read: small DV sets decode driver-side into an
    # Arrow local relation (LocalTableScan — no exchange, no Python);
    # the bound leaves room for the executor-decode path's repartition
    "iceberg_dv_delete_read": (3, False, True, None),
    # post-conversion read after rewrite_position_deletes: same DV-read
    # shape — merged blobs decode like any other deletion vector
    "iceberg_rewrite_pos_deletes": (3, False, True, None),
    "iceberg_convert_deletes": (3, False, True, None),
    # round 7: merge-on-read MERGE read-back — broadcast DV anti-join +
    # one agg exchange, 11 plan lines FLAT in matched-file count (no
    # per-file legs, no path literals); name-mapping read is a bare
    # renamed scan — zero exchanges, two read columns
    "iceberg_merge_mor": (2, False, True, None),
    "iceberg_update_mor": (2, False, True, None),
    # the mapped group reads each renamed field under BOTH physical
    # names and coalesces (mixed unpinned groups), so ReadSchema carries
    # one extra column per renamed field — still zero exchanges
    "iceberg_name_mapping_read": (0, False, False, 3),
    # late-r6 window additions: the statistics/management reads are
    # metadata- or stats-file-backed — tiny plans by design
    "iceberg_table_statistics": (0, False, False, None),
    "iceberg_partition_stats_file": (0, False, False, 3),
    "iceberg_add_files_read": (1, True, False, 2),
    "iceberg_rollback_read": (1, False, False, 2),
    # dynamic partition overwrite read: plain partitioned scan + one agg
    # exchange — the overwrite left plan shape untouched
    "iceberg_dynamic_overwrite": (1, False, False, 3),
    # spec-evolved point read: metadata pruned to 2 files, residual id=7
    # pushed to the parquet scan, 2-column ReadSchema, no shuffle
    "iceberg_spec_evolution_prune": (0, True, False, 2),
    # sort-order-clustered read: metadata prunes to the range-matching
    # files, predicate pushed to the parquet scan, no shuffle
    "iceberg_sorted_write_prune": (0, True, False, 2),
    # multi-format read: native parquet + native ORC + python AVRO legs,
    # one eq-delete anti-join (broadcast), one group-agg exchange each
    # side of the union; AVRO's mapInPandas repartition adds one
    "iceberg_multiformat_read": (4, False, True, None),
    # NULL-partition scoped eq delete: one tagged scan + scoped
    # anti-join (broadcast part-id map) + final agg exchange
    "iceberg_null_partition_scope": (3, False, True, None),
    # deterministic shard split: one narrow 2-col scan + one 16-key agg
    "training_shards": (1, False, False, 2),
    # data-quality sweep: 7 single-row aggregates unioned; the FK check
    # broadcasts the PK side; final rule sort is one exchange over 7 rows
    "data_quality_checks": (9, True, True, None),
    # round 9: fast DELETE read-back — the delete itself left only
    # tombstones + one boundary DV, so the read is a DV anti-join
    # (broadcast) + one group-agg exchange over the surviving files
    "iceberg_delete_where_fast": (2, False, True, None),
    # join-derived runtime pruning: the dim's key set reaches the scan
    # as an In filter (pushed), the join broadcasts, one agg exchange;
    # file count is witnessed separately in tests/test_joinprune.py
    "iceberg_join_prune_runtime": (2, True, True, None),
    # incremental dedup: delta-files scan LEFT-joins the prior corpus's
    # distinct-text set (broadcast at fixture scale; bucketed at 100 TB)
    "iceberg_incremental_dedup": (3, False, True, None),
    # v3 variant read: one native scan (the VariantType pair decodes in
    # the JVM), one group-agg exchange — no Python in the plan
    "iceberg_variant_read": (1, False, False, 2),
    "q19_disjunctive_filter": (1, True, True, None),
    "array_functions": (0, False, False, 2),
    "events_funnel": (2, True, False, 3),
    # round 3: the remaining TPC-H shapes (counts are fixture-scale —
    # small sides auto-broadcast; at 100 TB AQE re-decides those)
    "q2_min_cost_supplier": (3, True, True, None),
    "q9_product_type_profit": (1, True, True, None),
    "q11_value_concentration": (2, True, True, None),
    "q12_priority_by_returnflag": (1, True, True, 4),
    "q13_customer_order_distribution": (2, False, True, 3),
    "q15_top_supplier": (3, True, True, None),
    "q16_supplier_count_by_part": (2, True, True, None),
    "q17_small_quantity_revenue": (2, True, True, None),
    "q20_excess_stock_suppliers": (2, True, True, None),
    "q21_waiting_supplier": (1, True, True, None),
    # round 3: pipeline operators (narrow maps + small aggs; the
    # decontamination sweep broadcasts the benchmark inverted index)
    "sample_deterministic": (1, False, False, 3),
    "pii_redaction_stats": (1, False, False, 2),
    "decontaminate_ngram_overlap": (3, True, True, 2),
    "corpus_mixing_weights": (3, False, True, 3),
    # round 3b: corpus-curation extensions.  frequent_ngrams must use
    # TakeOrderedAndProject (per-partition top-k), never a global sort;
    # tfidf joins vocabulary stats (fixture-scale → broadcast, AQE
    # re-decides at 100 TB); histogram/stratified are one-exchange aggs.
    "frequent_ngrams": (1, False, False, 1),
    "stratified_sample": (1, False, False, 2),
    # tfidf: the (doc,term) matrix is checkpointed (df must be global →
    # no pushdown by design; final plan reads the materialized tf, so no
    # parquet scan appears)
    "tfidf_top_terms": (3, False, True, None),
    "events_value_histogram": (1, False, False, 2),
    # round 3c: deterministic sketches + curation.  KMV = distinct
    # shuffle + TakeOrdered + 1-row crossJoin broadcast; corr/dim-stats
    # are one partial-agg shuffle plus the output sort's range exchange;
    # winsorized joins the broadcast per-group quantile table back; the
    # unigram scorer shuffles (tokens, vocab) and broadcasts the 1-row
    # total; chunk dedup reads its localCheckpointed chunk index (no
    # parquet scan in the final plan, like tfidf).
    "distinct_kmv_estimate": (3, False, True, 1),
    "sampled_agg_deterministic": (1, False, False, 3),
    "events_corr_matrix": (2, False, False, 3),
    "zorder_cluster_stats": (2, False, False, 2),
    # r11 Hilbert census: same shape as the Morton census — the curve
    # transform is a linear projection chain, still 2-column read, one
    # group-agg + one ordering exchange
    "hilbert_cluster_stats": (2, False, False, 2),
    "winsorized_stats": (3, True, True, 2),
    "embedding_dim_stats": (2, True, False, 1),
    "domain_cap_sample": (2, False, False, 3),
    "quality_unigram_meanprob": (4, False, True, 2),
    # r15: the dup flag is a min/max window over the chunk-hash
    # partition (one shuffle of the chunk frame + the output ordering
    # exchange) — the agg-then-broadcast-join shape this contract
    # previously pinned shuffled the frame twice
    "dedup_chunks_exact": (2, False, False, None),
    # round 4: histogram quantile sketch — two data passes (stats agg +
    # bin agg), tiny broadcasted joins for the readout; must contain NO
    # exact-percentile aggregate (see NO_UNBOUNDED_AGGS below)
    "approx_quantiles_histogram": (4, False, True, 2),
    # count-min heavy hitters: sketch agg (DEPTH·WIDTH groups) + exact
    # top-K term agg + broadcast probe join + output sort
    "approx_topk_countmin": (4, False, True, 1),
    # round 8: metadata-delta changelog — each side scans ONLY the
    # window's delta files (pruning witnessed by
    # test_changelog_rows_metadata_delta_pruning via inputFiles);
    # (file,pos) identity anti-joins broadcast at fixture scale.  The
    # net variant adds the carry-over groupBy (one more exchange).
    "iceberg_changelog_rows": (4, False, True, None),
    "iceberg_changelog_net": (5, False, True, None),
    # round 8: v3 row lineage — the lineage read is the plain scan plus
    # a map-literal lookup (no extra exchange); the row-identity
    # changelog adds one full-outer join over the DELTA subsets
    "iceberg_row_lineage": (1, False, False, None),
    "iceberg_changelog_pairs": (5, False, True, None),
    # round 8b: SemDeDup — cluster assignment is a per-row expression,
    # so the only exchanges are the within-cluster candidate join's
    # dedup + the kept-flag join; 2-column ReadSchema (vec_id, embedding)
    "semdedup_prune": (3, False, True, 2),
    # round 8b: Iceberg views — reading through a view must cost exactly
    # the underlying query: one agg exchange, column-pruned scan
    "iceberg_view_read": (1, False, False, 3),
    "iceberg_view_time_travel": (1, False, False, 3),
    # round 8b: position_deletes metadata table — delete-sized scan of
    # the delete parquet only, zero exchanges, never a data-file read
    "iceberg_position_deletes": (0, False, False, None),
    # round 9: cross-document span dedup — gram hash-agg + semi-join
    # back + per-document island windows; 2-col ReadSchema.  The trim
    # variant checkpoints the tiny merged-span frame, so its final plan
    # is two narrow corpus scans + the position anti-join + the ordered
    # listagg reassembly (per-group state bounded by document length).
    "span_dedup_stats": (3, False, True, 2),
    "span_dedup_trim": (3, False, True, 2),
    # round 10: migrated legacy eq-delete table — the same single-
    # anti-join MOR shape as any eq-delete read (broadcast delete keys,
    # one final agg exchange)
    "iceberg_legacy_eq_migration": (2, False, True, None),
    # driver-written variant pair: one native scan projected to the
    # single payload column (ReadSchema counts 2: the variant field
    # prints as a nested struct wrapper), variant_get decodes in the
    # JVM, one group-agg exchange — no Python in the plan
    "iceberg_variant_write": (1, False, False, 2),
    # shredded-prune read: the footer pass already dropped dead files,
    # so the plan is ONE surviving-file scan + the global agg
    "iceberg_variant_shredded_prune": (1, False, False, 2),
    # round 10 session 2: metadata-only aggregate pushdown — the answer
    # is a driver-combined literal relation (LocalTableScan); ZERO
    # exchanges because zero data files are read (the query itself
    # hard-asserts files_scanned == 0)
    "iceberg_agg_pushdown": (0, False, False, None),
    # hybrid variant: the boundary-file scan ran eagerly inside the
    # operator (asserted files_scanned == 1 there); the returned plan is
    # the combined literal
    "iceberg_agg_pushdown_hybrid": (0, False, False, None),
    # Bloom-prefiltered fact-dim join: dim predicates push into its
    # scan, the probe is codegen getbit over an array literal (no
    # Python), dim broadcasts, one final single-group agg exchange
    "bloom_filter_join": (1, True, True, None),
    # file-level Bloom index point lookup: the index pass leaves a
    # handful of files, the equality residual pushes into their scan,
    # one global-agg exchange
    "iceberg_bloom_index_prune": (1, True, False, 3),
    # r11 ANALYZE TABLE: metadata battery + the one string-bounds
    # residual scan; result is a literal relation
    "iceberg_analyze_table": (1, False, False, None),
    # r11 GIF frame-sampled decode: one mapInPandas leg over (doc_id,
    # payload) — zero exchanges, bytes never reach the driver
    "multimodal_gif_frames": (0, False, False, 2),
    # r11 NPY tensor roundtrip: one mapInPandas leg over
    # (vec_id, embedding) — zero exchanges, buffers stay executor-side
    "multimodal_npy_decode": (0, False, False, 2),
    # r11 BM25 keyword ranking: one narrow scan, a single-row global
    # aggregate broadcast back, TakeOrdered top-k
    "keyword_rank_bm25": (2, False, True, 2),
    # r11 histogram-ordered star join: both dims metadata-small →
    # broadcast, range filters pushed into the dim scans, one agg
    # exchange
    "iceberg_cbo_range_join": (1, True, True, None),
    # r11 gopher repetition filters: two explode → (doc_id, gram) →
    # doc_id agg legs broadcast-joined back to the row-local stats leg
    # (AQE broadcasts the small doc_id aggregates): 4 exchanges
    "gopher_repetition_filters": (4, False, True, None),
    # r11 token bloom keyword search: token-pruned shard scan + the
    # tokenized array_contains residual (codegen, not pushable to the
    # parquet footer) + one group-agg exchange; ReadSchema = the 3
    # projected columns plus `text` for the residual
    "iceberg_token_search": (1, False, False, 4),
    # grouped metadata aggregate: 83 group rows combined driver-side
    # from manifest stats — a literal relation, zero exchanges
    "iceberg_agg_pushdown_groupby": (0, False, False, None),
    # r11 SUM/AVG pushdown from per-file sum blobs: 83 grouped rows
    # combined driver-side (manifest counts + colsum blobs), zero data
    # files (hard-asserted in the query) — literal relation
    "iceberg_agg_pushdown_sum": (0, False, False, None),
    # r11 incremental materialized rollup: the lifecycle runs eagerly
    # inside the operator (changelog-delta refresh hard-asserted ≤3
    # source files there); the returned plan is one narrow scan of the
    # group-sized rollup table — zero exchanges
    "iceberg_rollup_incremental": (0, False, False, None),
    # r11 join rollup: the lifecycle (fact writes, MOR delete, delta-
    # join refresh) runs eagerly inside the operator (≤3 fact files
    # hard-asserted); the returned plan is one narrow scan of the
    # segment-sized rollup — zero exchanges
    "iceberg_join_rollup": (0, False, False, None),
    # r11 materialized-view aggregate rewrite: re-aggregate the
    # group-sized rollup (one agg exchange), ZERO source data IO
    # (hard-asserted in the query); the read prunes to the 4
    # grouped/summed columns — the comma-split ReadSchema counter sees
    # 5 because sum_l_orderkey prints as decimal(38,0)
    "iceberg_rollup_answer": (1, False, False, 5),
    # round 10 session 3: theta NDV readout is pure metadata (sketch
    # blobs decoded driver-side) — a literal relation, zero exchanges
    "iceberg_theta_ndv": (0, False, False, None),
    # distributed multi-format write readback: union of the native
    # parquet/ORC legs and the AVRO python leg, one group-agg exchange
    # (no deletes in this fixture, so no anti-join broadcast)
    "iceberg_write_formats": (2, False, False, None),
    # stats-ordered star join: both dims broadcast (metadata-small),
    # the big dim's bcat filter pushes into its scan, one agg exchange
    "iceberg_cbo_join": (2, True, True, None),
    # NDV-from-statistics battery: theta blobs + manifest pushdown,
    # zero data files (hard-asserted in the query) — literal relation
    "iceberg_agg_pushdown_ndv": (0, False, False, None),
    # sketch set-difference between two stats snapshots: pure metadata
    "iceberg_stats_delta": (0, False, False, None),
    # statistics metadata view through SQL: local relation + the MAX
    # subquery's tiny agg — never a data-file read
    "iceberg_sql_statistics": (2, False, False, None),
    # r11: the Q9-shaped star planned end-to-end by the CBO — every dim
    # broadcast-hinted from metadata (the fact never shuffles for a
    # join; the only exchange is the final group agg), part's range
    # filter pushed into its scan
    "q9_cbo_star": (1, True, True, None),
    # r11: two-table transactional read — broadcast dim join + the one
    # group-agg exchange; plain scans (atomicity is a commit property,
    # it must cost the plan nothing)
    "iceberg_txn_two_tables": (1, False, True, None),
    # r12 grouped percentile pushdown: answered from the grouped
    # quantile blob driver-side (zero data files hard-asserted in the
    # query) — a literal relation, zero exchanges
    "iceberg_percentile_groupby": (0, False, False, None),
    # r12 mergeable quantile maintenance: the lifecycle (bootstrap,
    # O(new files) append refresh, dirty-leg delete refresh) runs
    # eagerly inside the operator (partials_computed hard-asserted
    # there); the returned plan is a one-row literal — zero exchanges
    "iceberg_quantile_refresh": (0, False, False, None),
    # r12 streaming quantile maintenance: the stream runs eagerly
    # inside the operator (per-epoch partials hard-asserted there);
    # the returned plan is a one-row literal — zero exchanges
    "streaming_quantile_sink": (0, False, False, None),
    # r12 correlation-aware star: both dims metadata-small → broadcast,
    # the range/eq filters pushed into the dim scans, one agg exchange
    "iceberg_cbo_conditional": (1, True, True, None),
    # r12 grouped NDV pushdown: answered from the grouped theta blob
    # driver-side (zero data files hard-asserted in the query) — a
    # literal relation, zero exchanges
    "iceberg_ndv_groupby": (0, False, False, None),
    # r13 incremental grouped-NDV maintenance: the lifecycle (bootstrap,
    # O(new files) append refresh, dirty-leg delete refresh) runs
    # eagerly inside the operator (partials_computed hard-asserted
    # there); the returned ndv_groupby answer is served from the merged
    # blob — a literal relation, zero exchanges
    "iceberg_ndv_refresh": (0, False, False, None),
    # r13 non-identity grouped quantile maintenance: lifecycle runs
    # eagerly inside the operator (strategy/partials hard-asserted
    # there); the returned per-group summary is a literal relation
    "iceberg_grouped_quantile_refresh": (0, False, False, None),
    # r13 global NDV via per-file theta partials: lifecycle eager in
    # the operator (mode "partials" + IO census hard-asserted); the
    # returned NDV pair is a one-row literal — zero exchanges
    "iceberg_global_ndv_refresh": (0, False, False, None),
    # r13 streaming grouped-NDV maintenance: the stream runs eagerly
    # inside the operator (per-epoch partials hard-asserted); the
    # returned ndv_groupby answer is a literal — zero exchanges
    "streaming_ndv_sink": (0, False, False, None),
    # r14 one-scan maintenance: the six-family refresh runs eagerly
    # inside the operator (1 raw read / 1 dirty read / 0 fallbacks
    # hard-asserted there); the returned stats summary joins two
    # metadata-sized literal relations via an explicit broadcast —
    # zero shuffles
    "iceberg_maintain_stats_onepass": (0, False, True, None),
    # r14 pair-keyed conditional star: both dims metadata-small →
    # broadcast, filters pushed into the dim scans, one agg exchange
    "iceberg_cbo_pair_pins": (1, True, True, None),
    # r14 derived day(ts) grouped NDV: answered from the blob — a
    # literal relation, zero exchanges
    "iceberg_ndv_per_day": (0, False, False, None),
    # r14 census-driven skew salting: the join keys on (key, salt) so
    # the census-flagged hot key splits salt-ways (salt columns
    # hard-asserted inside the query).  At audit scale AQE broadcasts
    # the 40-row dim (1 exchange); at skew scale the bound covers the
    # two salted shuffles + the agg exchange.
    "iceberg_salted_skew_join": (3, False, False, None),
    # r14 multi-config grouped NDV: both groupings' answers come from
    # their blobs — two literal relations unioned, zero exchanges
    "iceberg_ndv_multi_grouping": (0, False, False, None),
    # r15 salted STAR leg: the metadata-large big dim leg shuffles on
    # (key, salt) — census-flagged hot key split in the plan, salt
    # columns hard-asserted inside the query — while the 3-row small
    # dim broadcasts.  Bound covers the salted join's two shuffle
    # sides + the final agg exchange; AQE may collapse the dim side
    # to a runtime broadcast at audit scale.
    "iceberg_cbo_salted_star": (3, False, True, None),
}

# Aggregates whose per-group state grows with the data (they buffer every
# value) — a scale-killer at 100 TB.  No audited plan may contain them.
# (percentile_approx / approx_percentile are bounded sketches and allowed:
# the name must start at a word boundary that excludes '_', so
# "approx_percentile(" cannot match via its trailing "_percentile(" —
# only the explicitly allowed partial_/merge_/final_ codegen prefixes may
# precede an underscore.)
NO_UNBOUNDED_AGGS = re.compile(
    r"(?:^|[^a-z_])(?:partial_|merge_|final_)?"
    r"(percentile|median|mode|collect_list|collect_set)\("
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from daskberg_spark.session import get_spark

    queries = entry_mod.queries()
    spark = get_spark("plan-audit", cpus=8)
    failures = 0
    for name, (max_ex, want_push, want_bcast, max_cols) in AUDIT.items():
        if only and name not in only:
            continue
        fn = queries.get(name)
        if fn is None:
            print(f"skip  {name}: not registered")
            continue
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_exchange = len(re.findall(r"\bExchange\b", plan))
        pushed = bool(re.search(r"PushedFilters: \[[^\]]*Is|PushedFilters: \[[^\]]*(Greater|Less|Equal|In)", plan))
        bcast = "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        read_cols = None
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        if m:
            read_cols = len([c for c in m.group(1).split(",") if c])
        problems = []
        if n_exchange > max_ex:
            problems.append(f"exchanges {n_exchange} > {max_ex}")
        if want_push and not pushed:
            problems.append("no PushedFilters on scan")
        if want_bcast and not bcast:
            problems.append("expected broadcast join")
        if max_cols is not None and read_cols is not None and read_cols > max_cols:
            problems.append(f"reads {read_cols} cols (want <= {max_cols})")
        m_unbounded = NO_UNBOUNDED_AGGS.search(plan)
        if m_unbounded:
            problems.append(
                f"unbounded-state aggregate {m_unbounded.group(1)}() in plan"
            )
        status = "FAIL" if problems else "ok  "
        failures += bool(problems)
        print(
            f"{status}  {name}: exchanges={n_exchange} pushed={pushed} "
            f"broadcast={bcast} read_cols={read_cols}"
            + ("  [" + "; ".join(problems) + "]" if problems else "")
        )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
