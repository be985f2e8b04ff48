#!/usr/bin/env python
"""Dump formatted physical plans of the headline queries to
BENCH/plans.md — the `.explain("formatted")` evidence of plan quality
(pushdown, pruning, broadcasts, partial aggregation, single exchanges)
reviewed after every operator lands."""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHOWCASE = [
    ("scan_prune", "filter + 3-column projection reach the parquet reader"),
    ("join_broadcast", "dim broadcast: the fact table is never shuffled"),
    ("multi_join", "star join: all three dims broadcast, one final agg shuffle"),
    ("groupby_agg", "partial HashAggregate before the single exchange"),
    ("order_restore", "global top-N via TakeOrderedAndProject, no global sort"),
    ("dedup_exact", "map-side digest, one exchange keyed by it"),
    ("dedup_minhash_lsh", "K minhashes in one partial-agg pass, band self-join"),
    ("doc_fingerprint",
     "rolling-hash min via one numpy kernel map-side: zero exchanges"),
    ("cube_counts",
     "CUBE grouping sets: map-side Expand + partial agg, one exchange"),
    ("dedup_embed_cosine",
     "persisted IVF index + shuffled sub-bucket pair join (broadcast is "
     "O(K*dim) centroids only)"),
    ("dedup_simhash_pairs", "banded Hamming-k: per-band equi-join, no pairwise scan"),
    ("asof_join", "union + window forward-fill: no join node, one exchange"),
    ("range_join_bucketed",
     "interval join as bucket equi-join + residual filter, fact never NLJ-scanned"),
    ("quality_score", "token/stopword counts via array functions: zero exchanges"),
    ("extract_transcripts", "scan -> one salted exchange -> one MapInArrow stage"),
    ("dedup_groups",
     "connected components: the converged label map (per-round "
     "localCheckpoint truncates lineage, so the final plan is one scan)"),
    ("kmeans_lloyd",
     "k-means iteration: ArrowEvalPython argmin inside the scan stage, "
     "K-group partial-agg means, one K-row exchange"),
    ("streaming_extract",
     "streaming result read-back: the micro-batch ran under the "
     "checkpointed file sink; this is the committed-output scan"),
    ("distinct_agg",
     "multi-distinct via Expand + two-phase agg: shuffle carries "
     "distinct (group,value) pairs, not rows"),
    ("window_funcs",
     "four window families over ONE shared sort: single exchange on "
     "the partition key"),
    ("ann_ivf_assign",
     "IVF assignment: numpy argmin inside the scan stage — no n*K "
     "crossJoin expansion, no per-vector window shuffle (r3 fix)"),
    ("dedup_embed_cosine_mp",
     "multi-probe pair join: same sub-bucketed ShuffledHashJoin engine, "
     "probe-exploded inverted lists, O(K*dim) broadcast only"),
    ("group_quantiles_approx",
     "approx_percentile summaries partially aggregate map-side — the "
     "bounded-memory quantile path exact percentile cannot offer"),
    ("text_normalize", "regex canonical form: zero exchanges, one codegen stage"),
    ("repetition_ratio",
     "one doc_id exchange feeds BOTH aggregation levels (hashpartitioning "
     "on doc_id serves the (doc,tok) clustering too)"),
    ("decontaminate",
     "eval shingle set broadcasts; the corpus is probed map-side, never "
     "shuffled for the join"),
    ("inverted_index",
     "bounded-df postings: distinct (doc,tok) + token groupBy, hot tokens "
     "dropped by the df band"),
    ("pack_sequences",
     "distributed prefix sum: block totals -> tiny single-partition "
     "cumulative window -> per-block windows at full parallelism"),
    ("skew_join_salted",
     "explicit salt decomposition: ShuffledHashJoin on (key, salt), the "
     "dim exploded xS so hot fact keys spread over S reducers"),
    ("rolling_window",
     "bounded-overlap bucket decomposition: one (type, bucket) exchange "
     "into the O(n log n) grouped kernel — no quadratic JVM RANGE frame"),
    ("snapshot_diff",
     "digest-based CDC: the full-outer exchange carries (id, md5) only, "
     "payload bytes never shuffle"),
    ("bigram_pmi",
     "in-array bigram construction map-side; only vocabulary-sized "
     "aggregates and their joins exchange; 1-row total broadcasts"),
    ("embed_quantize_int8",
     "bit-exact int8 quantization + integer dot product: one Arrow pass, "
     "zero exchanges"),
    ("chunk_documents",
     "context-window chunking as generate-over-scan: zero exchanges, "
     "offsets carried for provenance"),
    ("heavy_hitters_cms",
     "Count-Min sketch: K fixed-width sketch tables broadcast, token "
     "stream shuffles only for its own aggregates"),
    ("sparse_retrieval",
     "index-pruned lexical scoring: Q-row query broadcast over cached "
     "postings, TakeOrdered cut on the rounded score"),
    ("pagerank_bipartite",
     "power iteration as edges-joins-ranks + same-key degree join + "
     "partial-agg sum per destination; N rides a 1-row broadcast"),
    ("group_quantiles_dist",
     "two-pass histogram selection: only rank-containing buckets are "
     "re-ranked, window state bounded by one bucket's occupancy"),
    ("pii_redact",
     "inject + redact + digest inside one codegen stage, zero "
     "exchanges"),
    ("dup_span_report",
     "span-level duplication audit: in-array window digests map-side, "
     "both shuffles keyed on the 128-bit digest / doc_id — df is a "
     "scalar per digest, no pair materialization to cap"),
    ("scrub_dup_spans",
     "C4-style scrub: dup digests + owners partial-agg, covered token "
     "positions via in-array sequence, left-anti filter, per-doc "
     "in-group reassembly — never a global sort"),
    ("unigram_logprob",
     "corpus-LM scoring: vocab partials shuffle on the token key "
     "(O(|V|) rows) + a 1-row total, both broadcast back onto the "
     "token stream; the per-doc mean reuses the doc_id repartition "
     "(no extra exchange)"),
    ("quality_funnel",
     "staged gates as one map-side conditional-sum pass: single 1-row "
     "exchange, integer-exact thresholds"),
    ("cdc_chunks",
     "content-defined chunking: one np.correlate per doc inside "
     "MapInPandas, 1->N chunk rows in-batch, zero shuffle after the "
     "parallelism repartition"),
    ("profile_table",
     "one-pass table profiling: 28 statistics (incl. 4 exact NDVs over "
     "one shared Expand) in a single agg; the exact NDVs make the "
     "first exchange hash-partitioned on the distinct values "
     "(NDV-scaled) — the approx_count_distinct swap (see "
     "approx_distinct) is what makes it 1-row-mergeable at 100 TB"),
    ("zorder_cluster",
     "Morton interleave as a codegen'd integer expression tree: zero "
     "exchanges, the layout key for 2-D data skipping"),
    ("turn_structure_qa",
     "per-conversation structure gate: role runs + contiguity + tool "
     "mix — two windows and two agg levels on ONE conv_id exchange"),
    ("context_windows",
     "chat-history packing: sliding collect_list frame duplicates "
     "context inside the window operator — each turn crosses the wire "
     "once, not k times"),
    ("link_extract",
     "URL/host stats: map-side JVM regex extract-all + explode, "
     "bounded-key rollup; exact distinct docs = the standard "
     "(host, doc_id) two-phase (approx_count_distinct is the "
     "1-row-mergeable swap)"),
    ("pack_sequences_sharded",
     "shard-local concat-and-chunk packing: per-shard window cumsum — "
     "one shard exchange, no global sort; pack/offset arithmetic "
     "map-side (the global-semantics twin is pack_sequences)"),
    ("loss_mask_spans",
     "SFT loss masking: target-span offsets inside the packed example, "
     "same single conv_id window exchange as context_windows"),
    ("tool_transitions",
     "agent-step Markov matrix: map-side CASE labels, one conv_id lag "
     "window, bounded-key (prev, step) rollup"),
    ("conversation_dedup",
     "whole-conversation ordered-digest dedup: array_sort(collect_list) "
     "in ONE per-conv ObjectHashAggregate — order restored in-group, "
     "not via a sort exchange"),
    ("winnow_fingerprints",
     "MOSS winnowing: rolling hash + window-min selection + digest all "
     "inside one MapInPandas scan stage — zero exchanges at any corpus "
     "size (selection and digest are per-document)"),
    ("scd2_dimension",
     "SCD2 build: ONE user_id exchange serves both windows — change "
     "detection (lag) and interval chaining (lead + row_number) reuse "
     "the same hash partitioning, the second pass is sort-only"),
    ("semdedup",
     "cluster-local semantic dedup: shared IVF assignment persisted, "
     "sub-bucketed ShuffledHashJoin pair scan, verdict via left join "
     "on vec_id — no broadcast of any corpus-sized side"),
    ("merge_upsert",
     "MERGE INTO semantics: ONE full-outer shuffle join on the key; "
     "the changes side is hash-joined, not broadcast — safe under "
     "backfill-sized change sets, AQE may downgrade at runtime"),
    ("triangle_count",
     "oriented triangle enumeration: low->high edges generate each "
     "triangle once; two equi-joins keyed on wedge endpoints, no "
     "broadcast, no collect"),
    ("sample_k_per_group",
     "exact-k per group: one group-key exchange + per-group sort + "
     "rank cutoff (window top-k shape, never a global sort)"),
    ("jaccard_prefix_filter",
     "PPJoin prefix filter: token/freq/size partial aggs, ONE bounded "
     "per-doc rank window (state = tokens/doc), capped groupBy(tok) "
     "bucket expansion, exact verify re-join — no all-pairs scan"),
    ("fuzzy_join_del1",
     "deletion-neighborhood fuzzy join: map-side signature explode, ONE "
     "groupBy(sig) with in-array pair expansion, JVM levenshtein "
     "verify; small sides broadcast via AQE, no window, no cartesian"),
    ("sketch_rollup",
     "mergeable HLL rollup: per-(type,day) sketch partial agg "
     "(ObjectHashAggregate), union-merge re-agg at coarser key, "
     "two-level exact-distinct agg for the contract check"),
    ("ann_recall_eval",
     "ANN recall@k eval: ALL Q queries scored in ONE map-side Arrow "
     "pass ((Q,dim) matrix in closure), per-query rank windows for "
     "exact vs probed top-k, broadcast probe join, left-join overlap"),
    ("dedup_incremental",
     "new-batch-vs-corpus ingest dedup: capped groupBy(sh) doc-lists "
     "with IN-ARRAY new x old pair expansion — no second shingle "
     "shuffle, no pairwise join; per-new-doc verdict via rank window"),
    ("lsh_recall_eval",
     "blocking-quality eval: exact-Jaccard truth LEFT JOIN LSH "
     "candidates on the pair key, one partial-agg scoreboard row — "
     "both inputs the already-capped blocking paths"),
    ("changelog_compact",
     "CDC changelog -> latest-wins state: 3-way union shuffles ONCE on "
     "the key, WindowGroupLimit drops non-latest ops before the full "
     "window sort, tombstones filtered — compaction as a pure reduce"),
    ("ewma_trailing",
     "trailing exponential decay: daily partial agg FIRST, then the "
     "14x weight fan-out of the tiny series (never of raw events); "
     "weights are shared float64 literals, spine join broadcasts"),
    ("score_deciles",
     "global deciles via the two-level rank: per-value counts + tiny "
     "prefix window + value-partitioned row_number — the row-shaped "
     "window never sees a single global partition"),
    ("context_truncate",
     "token-budget left truncation: one conv_id exchange, reverse "
     "cumulative window, budget filter — suffix semantics in one pass"),
    ("bigram_lm_logprob",
     "bigram LM scoring: in-array bigram assembly (zip_with, no "
     "self-join), vocab-keyed count joins, 1-row V broadcast, exact "
     "integer ratios into log2"),
    ("dedup_threshold_sweep",
     "threshold dial report: reads the session-memoized verified-pairs "
     "InMemoryRelation — the sweep never re-runs the minhash chain"),
    ("hourly_profile",
     "seasonality profile: events collapse to 24 x #types integer-cents "
     "partials FIRST; the peak window ranks bounded groups only"),
    ("ks_statistic",
     "distributed two-sample KS: per-cent counts, bucket-partitioned "
     "cumsum + broadcast bucket offsets — no global single-task window; "
     "D numerator exact BIGINT"),
    ("corr_matrix",
     "one-pass Pearson matrix: 15 decimal(38)-exact moment sums in one "
     "partial-agg scan; 6 pair rows generated from the 1-row result"),
    ("domain_blocklist",
     "suffix-exploded blocklist match: map-side >=2-label suffix "
     "expansion + BroadcastHashJoin, replacing the unjoinable LIKE scan"),
    ("preference_pairs",
     "RLHF pair construction: source-partitioned rank window + one "
     "arg-min/max partial agg keyed on the rank — no self-join of the "
     "ranked stream"),
    ("padding_waste",
     "padding-efficiency report: map-side power-of-two bucketing into "
     "a log2-bounded partial agg, one scan"),
    ("cross_dedup_sources",
     "duplicate-provenance matrix: the self-join runs on per-(hash, "
     "source) COUNTS — fan-out bounded by source cardinality, never by "
     "document count"),
    ("gopher_rules",
     "Gopher quality gates: all four rules evaluate map-side by integer "
     "cross-multiplication; the only exchange is the per-source partial "
     "agg"),
    ("discounted_returns",
     "discounted returns in dyadic fixed point: 8 lead() taps share ONE "
     "WindowExec over one conv_id exchange"),
    ("line_dedup",
     "C4 line dedup: map-side chunking, one partial-agg frequency pass, "
     "the over-threshold blocklist joined back (broadcast under AQE), "
     "within-group order-restoring reassembly — no global sort"),
    ("compaction_plan",
     "compaction bin-packing runs on the MANIFEST scale: one partial "
     "agg builds the file inventory, the greedy bin window is "
     "partitioned by table partition, never global"),
    ("shard_interleave",
     "training order as a column: per-source window rank + arithmetic "
     "position — a total order no task ever materializes"),
    ("epoch_shuffle",
     "seeded global permutation via two-level rank: per-key counts -> "
     "65,536-row-bounded prefix window -> parallel within-key "
     "row_number; row-shaped data is never range-partitioned"),
    ("pareto_frontier",
     "2D skyline without the O(n^2) dominance self-join: value-level "
     "max agg -> prefix-max window over value rows -> one broadcast "
     "join back"),
    ("sliding_mau",
     "sliding distinct via day-spine range join: distinct-reduce "
     "first, broadcast spine, fan-out bounded by the window length"),
    ("assoc_rules",
     "market-basket rules: baskets distinct-reduce, pairs generate "
     "in-array (alphabet-bounded), supports are partial-agg counts"),
]


def main() -> int:
    from pyspark.sql import SparkSession

    from occular_ocr_spark.queries import QUERIES

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("dump-plans")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.001"
    parts = [
        "# Physical plans of the headline queries\n",
        "Generated by `python scripts/dump_plans.py` "
        f"(`explain('formatted')`, sf0.001, AQE on).\n",
    ]
    for name, why in SHOWCASE:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        parts.append(f"\n## {name}\n\n*{why}*\n\n```\n{buf.getvalue().strip()}\n```\n")
    out = os.path.join(REPO, "BENCH", "plans.md")
    with open(out, "w") as f:
        f.write("".join(parts))
    print(f"wrote {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
