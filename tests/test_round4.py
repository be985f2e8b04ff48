"""Round-4 catalog semantics tests (eval harnesses, incremental
ingest, context assembly, EWMA, changelog compaction, deciles,
profiling, reply latency).  Gate-level value-hash equality vs DuckDB is
covered by scripts/check_queries.py; these pin the algorithmic
invariants independently."""

from __future__ import annotations

from occular_ocr_spark.queries_round4 import (
    _CTX_BUDGET,
    _EWMA_WINDOW_D,
    _INC_NEW_MOD,
    _ewma_weights,
    q_changelog_compact,
    q_context_truncate,
    q_dedup_incremental,
    q_ewma_trailing,
    q_lsh_recall_eval,
    q_minhash_est_error,
    q_reply_latency_stats,
    q_score_deciles,
    q_script_profile,
)

SF = "/root/testdata/sf0.001"


def test_lsh_recall_eval_bounds(spark):
    row = q_lsh_recall_eval(spark, SF).collect()[0]
    assert row["n_true"] > 0
    assert 0 <= row["n_recalled"] <= row["n_true"]
    assert 0.0 <= row["recall"] <= 1.0
    assert row["recall"] == round(row["n_recalled"] / row["n_true"], 6)


def test_minhash_est_error_consistency(spark):
    from occular_ocr_spark.queries import _MINHASH_SEEDS, q_dedup_minhash_verify

    rows = q_minhash_est_error(spark, SF).collect()
    n_pairs = q_dedup_minhash_verify(spark, SF).count()
    assert len(rows) == n_pairs > 0
    for r in rows:
        # estimate is a multiple of 1/K
        assert abs(r["j_est"] * _MINHASH_SEEDS - round(r["j_est"] * _MINHASH_SEEDS)) < 1e-9
        assert 0.0 <= r["j_est"] <= 1.0
        assert abs(r["abs_err"] - round(abs(r["j_exact"] - r["j_est"]), 6)) <= 1e-6


def test_dedup_incremental_split_and_verdicts(spark):
    rows = q_dedup_incremental(spark, SF).collect()
    assert rows, "expected at least one flagged new doc at sf0.001"
    seen = set()
    for r in rows:
        assert r["doc_id"] % _INC_NEW_MOD == 0          # new-batch side
        assert r["dup_of"] % _INC_NEW_MOD != 0          # corpus side
        assert r["jaccard"] >= 0.5
        assert r["doc_id"] not in seen                  # one verdict per doc
        seen.add(r["doc_id"])


def test_context_truncate_is_budgeted_suffix(spark):
    from occular_ocr_spark.queries import _t
    from pyspark.sql import functions as F

    kept = q_context_truncate(spark, SF).collect()
    by_conv: dict[str, list] = {}
    for r in kept:
        assert r["cum_from_end"] <= _CTX_BUDGET
        by_conv.setdefault(r["conv_id"], []).append(r)
    # reconstruct per-conv token counts to check the SUFFIX property
    toks = {
        (r["conv_id"], r["turn_idx"]): r["n_tok"]
        for r in _t(spark, SF, "documents")
        .select(
            F.concat(
                F.lit("conv-"), (F.col("doc_id") / 10).cast("bigint").cast("string")
            ).alias("conv_id"),
            (F.col("doc_id") % 10).cast("int").alias("turn_idx"),
            F.size(F.split("text", " ")).alias("n_tok"),
        )
        .collect()
    }
    convs = {c for c, _ in toks}
    for conv, rows in by_conv.items():
        idxs = sorted(r["turn_idx"] for r in rows)
        all_idxs = sorted(i for c, i in toks if c == conv)
        # kept turns are exactly the tail of the conversation
        assert idxs == all_idxs[-len(idxs):]
        # maximality: one more older turn would blow the budget
        older = [i for i in all_idxs if i < idxs[0]]
        if older:
            total = sum(toks[(conv, i)] for i in idxs) + toks[(conv, older[-1])]
            assert total > _CTX_BUDGET
    # a conversation absent from the output means even its LAST turn
    # alone exceeds the budget
    for conv in convs - set(by_conv):
        last = max(i for c, i in toks if c == conv)
        assert toks[(conv, last)] > _CTX_BUDGET


def test_ewma_trailing_matches_python(spark):
    from occular_ocr_spark.queries import _t
    from pyspark.sql import functions as F

    daily = {
        (r["event_type"], r["day"]): r["v"]
        for r in _t(spark, SF, "events")
        .select(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias(
                "day"
            ),
            "value",
        )
        .groupBy("event_type", "day")
        .agg(F.sum("value").alias("v"))
        .collect()
    }
    weights = _ewma_weights()
    rows = q_ewma_trailing(spark, SF).collect()
    assert len(rows) == len(daily)
    for r in rows[:50]:
        want = sum(
            daily.get((r["event_type"], r["day"] - j), 0.0) * weights[j]
            for j in range(_EWMA_WINDOW_D)
        )
        assert abs(r["ewma"] - want) < 1e-4, (r, want)


def test_changelog_compact_latest_wins(spark):
    rows = {r["doc_id"]: r for r in q_changelog_compact(spark, SF).collect()}
    from occular_ocr_spark.queries import _t

    base = {
        r["doc_id"]: r
        for r in _t(spark, SF, "documents")
        .select("doc_id", "source", "n_chars")
        .collect()
    }
    for doc_id, b in base.items():
        if doc_id % 13 == 0:
            assert doc_id not in rows          # tombstoned
        elif doc_id % 7 == 0:
            r = rows[doc_id]
            assert r["source"] == "patched" and r["last_seq"] == 2
            assert r["n_chars"] == b["n_chars"] + 1
        else:
            r = rows[doc_id]
            assert r["source"] == b["source"] and r["last_seq"] == 1
    assert set(rows) == {d for d in base if d % 13 != 0}


def test_score_deciles_partition(spark):
    rows = sorted(q_score_deciles(spark, SF).collect(), key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(10))
    n = sum(r["n_docs"] for r in rows)
    for r in rows:  # floor-rank deciles differ by at most 1 in size
        assert abs(r["n_docs"] - n / 10) < 1 + 1e-9
    # value ranges are monotone across deciles (ties may straddle)
    for a, b in zip(rows, rows[1:]):
        assert a["max_score"] <= b["min_score"] or a["max_score"] == b["min_score"]
        assert a["min_score"] <= a["max_score"]


def test_script_profile_ratios(spark):
    rows = q_script_profile(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_chars"] > 0
        for c in ("alpha_ratio", "digit_ratio", "space_ratio"):
            assert 0.0 <= r[c] <= 1.0
        assert r["alpha_ratio"] + r["digit_ratio"] + r["space_ratio"] <= 1.0 + 1e-9


def test_reply_latency_burst_clock(spark):
    rows = q_reply_latency_stats(spark, SF).collect()
    assert rows
    for r in rows:
        # the burst clock yields 30 s intra-burst and 3630 s inter-burst
        assert r["max_gap_s"] in (30, 3630)
        assert 30 <= r["avg_gap_s"] <= 3630
        assert 1 <= r["n_gaps"] <= 9


def test_bigram_lm_matches_python(spark):
    from collections import Counter

    from occular_ocr_spark.queries import _t
    from occular_ocr_spark.queries_round4 import q_bigram_lm_logprob

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in _t(spark, SF, "documents").select("doc_id", "text").collect()
    }
    c2, c1, vocab = Counter(), Counter(), set()
    for toks in docs.values():
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
    import math

    rows = q_bigram_lm_logprob(spark, SF).collect()
    assert len(rows) == sum(1 for t in docs.values() if len(t) >= 2)
    v = len(vocab)
    for r in rows[:25]:
        toks = docs[r["doc_id"]]
        lps = [
            math.log2((c2[(a, b)] + 1) / (c1[a] + v))
            for a, b in zip(toks, toks[1:])
        ]
        assert r["n_bigrams"] == len(lps)
        assert abs(r["logprob2"] - sum(lps) / len(lps)) < 1e-5
        assert r["logprob2"] < 0


def test_dedup_threshold_sweep_monotone(spark):
    from occular_ocr_spark.queries import q_dedup_minhash_verify
    from occular_ocr_spark.queries_round4 import q_dedup_threshold_sweep

    rows = sorted(
        q_dedup_threshold_sweep(spark, SF).collect(),
        key=lambda r: r["threshold_pm"],
    )
    assert [r["threshold_pm"] for r in rows] == [500, 600, 700, 800, 900]
    for a, b in zip(rows, rows[1:]):  # tightening can only shrink
        assert a["n_pairs"] >= b["n_pairs"]
        assert a["n_docs"] >= b["n_docs"]
    # the 0.5 row IS the verify set (its own threshold)
    pairs = q_dedup_minhash_verify(spark, SF).collect()
    assert rows[0]["n_pairs"] == len(pairs)
    assert rows[0]["n_docs"] == len(
        {r["doc_a"] for r in pairs} | {r["doc_b"] for r in pairs}
    )


def test_kfold_assign_balance_and_hash(spark):
    import hashlib

    from occular_ocr_spark.queries import _t
    from occular_ocr_spark.queries_round4 import _KFOLD_K, q_kfold_assign

    rows = q_kfold_assign(spark, SF).collect()
    assert {r["fold"] for r in rows} <= set(range(_KFOLD_K))
    total = sum(r["n_docs"] for r in rows)
    n_docs = _t(spark, SF, "documents").count()
    assert total == n_docs
    # replay the portable hash for a handful of ids
    per_fold = {}
    for r in rows:
        per_fold[r["fold"]] = per_fold.get(r["fold"], 0) + r["n_docs"]
    expect = {}
    for r in _t(spark, SF, "documents").select("doc_id").collect():
        h16 = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:4], 16)
        f = h16 % _KFOLD_K
        expect[f] = expect.get(f, 0) + 1
    assert per_fold == expect


def test_hourly_profile_single_peak(spark):
    from occular_ocr_spark.queries_round4 import q_hourly_profile

    rows = q_hourly_profile(spark, SF).collect()
    by_type = {}
    for r in rows:
        assert 0 <= r["hr"] < 24
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        peaks = [r for r in rs if r["is_peak"]]
        assert len(peaks) == 1, t
        assert peaks[0]["avg_value"] == max(r["avg_value"] for r in rs)
