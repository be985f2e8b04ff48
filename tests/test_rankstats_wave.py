"""Semantics tests for the wave-28 rank-statistics & storage-audit
entries: MRR@K, Spearman ρ (midranks), Kendall τ-b, Flesch readability,
and the zone-map prune report.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against an independent
single-node recomputation plus the plan shapes."""

from __future__ import annotations

import collections
import contextlib
import hashlib
import io
import math
import re

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_rankstats import (
    _ZM_FILES,
    _ZM_HI,
    _ZM_LO,
    _ZM_WIDTH,
    q_kendall_tau,
    q_mrr_eval,
    q_readability_score,
    q_spearman_corr,
    q_zone_map_prune,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _docs(spark):
    return (
        Q._t(spark, SF, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect()
    )


# ---------------------------------------------------------------------------
# mrr_eval
# ---------------------------------------------------------------------------


def test_mrr_eval_consistent_with_ndcg_harness(spark):
    # same ranking scaffold: a term with zero retrieved-relevant in
    # ndcg_eval must have rr == 0, and a first_rel_rank of 1 implies
    # p_at_k > 0; rr is exactly the half-up reciprocal of the rank
    ndcg = {r["tok"]: r for r in Q.QUERIES["ndcg_eval"](spark, SF).collect()}
    got = {r["tok"]: r for r in q_mrr_eval(spark, SF).collect()}
    assert set(got) == set(ndcg)
    for tok, r in got.items():
        if ndcg[tok]["n_ret_rel"] == 0:
            assert r["first_rel_rank"] is None and r["rr"] == 0.0
        else:
            assert r["first_rel_rank"] is not None
            k = r["first_rel_rank"]
            assert 1 <= k <= 10
            want = ((2_000_000 + k) // (2 * k)) / 1e6
            assert abs(r["rr"] - want) <= 1e-12


def test_mrr_eval_plan_per_term_window_and_broadcast(spark):
    p = _plan_of(q_mrr_eval(spark, SF))
    Q.release_persists()
    assert "BroadcastHashJoin" in p  # Q-row term list prunes postings
    assert "CartesianProduct" not in p


# ---------------------------------------------------------------------------
# spearman_corr
# ---------------------------------------------------------------------------


def _midranks(values):
    cnt = collections.Counter(values)
    out, below = {}, 0
    for v in sorted(cnt):
        out[v] = below + (cnt[v] + 1) / 2.0
        below += cnt[v]
    return out


def test_spearman_matches_naive_midrank_pearson(spark):
    rows = _docs(spark)
    xs = [r["n_chars"] for r in rows]
    ys = [len(r["text"].split(" ")) for r in rows]
    rx_map, ry_map = _midranks(xs), _midranks(ys)
    rx = [rx_map[v] for v in xs]
    ry = [ry_map[v] for v in ys]
    n = len(rows)
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    want = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    row = q_spearman_corr(spark, SF).collect()[0]
    assert row["n_rows"] == n
    assert abs(row["spearman_rho"] - round(want, 6)) <= 1e-5
    # length in chars and length in tokens must agree strongly
    assert row["spearman_rho"] > 0.8


def test_spearman_plan_no_per_row_global_sort(spark):
    p = _plan_of(q_spearman_corr(spark, SF))
    # the only windows run over per-VALUE count rows; the row-level
    # lineage is joins + one partial agg
    assert "CartesianProduct" not in p
    assert "HashAggregate" in p


# ---------------------------------------------------------------------------
# kendall_tau
# ---------------------------------------------------------------------------


def test_kendall_tau_matches_naive(spark):
    caps = {}
    for r in _docs(spark):
        a, b = caps.get(r["source"], (0, 0))
        caps[r["source"]] = (a + len(r["text"].split(" ")), b + r["n_chars"])
    srcs = sorted(caps)
    c = d = ta = tb = 0
    n0 = 0
    for i, s1 in enumerate(srcs):
        for s2 in srcs[i + 1 :]:
            n0 += 1
            da = caps[s1][0] - caps[s2][0]
            db = caps[s1][1] - caps[s2][1]
            if da * db > 0:
                c += 1
            elif da * db < 0:
                d += 1
            if da == 0:
                ta += 1
            if db == 0:
                tb += 1
    want = round((c - d) / (math.sqrt(n0 - ta) * math.sqrt(n0 - tb)), 6)
    row = q_kendall_tau(spark, SF).collect()[0]
    assert (row["n_pairs"], row["concordant"], row["discordant"]) == (n0, c, d)
    assert abs(row["tau_b"] - want) <= 1e-9
    # token mass and char mass must rank sources nearly identically
    assert row["tau_b"] > 0.8


# ---------------------------------------------------------------------------
# readability_score
# ---------------------------------------------------------------------------


def test_readability_matches_naive(spark):
    rows = [r for r in _docs(spark) if r["text"]]
    got = {r["doc_id"]: r for r in q_readability_score(spark, SF).collect()}
    assert set(got) == {r["doc_id"] for r in rows}
    for r in rows:
        words = len(r["text"].split(" "))
        sents = max(len(re.findall(r"[.!?]+", r["text"])), 1)
        syl = len(re.findall(r"[aeiouy]+", r["text"].lower()))
        want = round(206.835 - 1.015 * (words / sents) - 84.6 * (syl / words), 6)
        g = got[r["doc_id"]]
        assert (g["n_words"], g["n_sentences"], g["n_syllables"]) == (
            words,
            sents,
            syl,
        )
        assert abs(g["flesch"] - want) <= 1e-6


def test_readability_plan_is_map_side_only(spark):
    p = _plan_of(q_readability_score(spark, SF))
    assert "Exchange" not in p  # zero shuffles: scan → project → filter
    assert "Join" not in p


# ---------------------------------------------------------------------------
# zone_map_prune
# ---------------------------------------------------------------------------


def _hash16(doc_id: int) -> int:
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return int(h[:4], 16)


def test_zone_map_prune_matches_naive(spark):
    rows = _docs(spark)
    zones = collections.defaultdict(lambda: [None, None, 0])
    for r in rows:
        for layout, fid in (
            ("hash", _hash16(r["doc_id"]) % _ZM_FILES),
            ("bychars", r["n_chars"] // _ZM_WIDTH),
        ):
            z = zones[(layout, fid)]
            z[0] = r["n_chars"] if z[0] is None else min(z[0], r["n_chars"])
            z[1] = r["n_chars"] if z[1] is None else max(z[1], r["n_chars"])
            z[2] += 1
    want = {}
    for layout in ("hash", "bychars"):
        zs = [v for (lo, _), v in zones.items() if lo == layout]
        n_files = len(zs)
        scanned = [z for z in zs if z[1] >= _ZM_LO and z[0] <= _ZM_HI]
        want[layout] = (
            n_files,
            len(scanned),
            sum(z[2] for z in zs),
            sum(z[2] for z in scanned),
            ((2_000_000 * (n_files - len(scanned)) + n_files) // (2 * n_files))
            / 1e6,
        )
    got = {r["layout"]: r for r in q_zone_map_prune(spark, SF).collect()}
    assert set(got) == {"hash", "bychars"}
    for layout, (nf, fs, rt, rs, pf) in want.items():
        r = got[layout]
        assert (
            r["n_files"],
            r["files_scanned"],
            r["rows_total"],
            r["rows_scanned"],
        ) == (nf, fs, rt, rs)
        assert abs(r["prune_fraction"] - pf) <= 1e-12


def test_zone_map_value_layout_prunes_hash_layout_does_not(spark):
    got = {r["layout"]: r for r in q_zone_map_prune(spark, SF).collect()}
    # hash scatter puts the predicate range in every file; value
    # clustering confines it to ~(hi-lo)/width + 1 files
    assert got["hash"]["prune_fraction"] == 0.0
    assert got["bychars"]["prune_fraction"] > 0.5
    assert got["bychars"]["rows_scanned"] < got["bychars"]["rows_total"]
    # both layouts cover the identical corpus
    assert got["hash"]["rows_total"] == got["bychars"]["rows_total"]


def test_zone_map_plan_single_agg_no_join(spark):
    p = _plan_of(q_zone_map_prune(spark, SF))
    assert "Join" not in p and "CartesianProduct" not in p
    assert "HashAggregate" in p  # partial-agg zone maps then 2-row rollup
