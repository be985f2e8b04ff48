"""Semantics tests for the wave-30 corpus-shape entries: embedding
L2-norm audit, zone-range clustering depth, common-neighbor link
prediction, transcript role balance, and top-k shingle coverage.  The
DuckDB value-hash gate is scripts/check_queries.py; these pin each op
against an independent single-node recomputation plus the plan shapes."""

from __future__ import annotations

import collections
import contextlib
import hashlib
import io
import itertools
import math

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_rankstats import _ZM_FILES, _ZM_WIDTH
from occular_ocr_spark.queries_shape import (
    _COV_KS,
    _LP_DEG_CAP,
    _LP_MIN_COMMON,
    _LP_MIN_SHARED,
    _LP_SH_CAP,
    q_clustering_depth,
    q_embedding_norm_audit,
    q_link_prediction_jaccard,
    q_ngram_topk_coverage,
    q_role_balance,
)
from occular_ocr_spark.queries_transcript import _turns

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _r(v: float) -> int:
    # Spark F.round / HALF_UP on a non-negative value
    return int(math.floor(v + 0.5))


def _doc_shingles(spark):
    """Distinct 3-word shingles per document — the `_shingles` contract."""
    rows = Q._t(spark, SF, "documents").select("doc_id", "text").collect()
    out = {}
    for r in rows:
        toks = (r["text"] or "").split(" ")
        out[r["doc_id"]] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    return out


# ---------------------------------------------------------------------------
# embedding_norm_audit
# ---------------------------------------------------------------------------


def test_embedding_norm_audit_matches_naive(spark):
    rows = (
        Q._t(spark, SF, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    per_label = collections.defaultdict(list)
    for r in rows:
        s = sum(_r(float(x) * float(x) * 1e9) for x in r["embedding"])
        per_label[r["label"]].append((_r(math.sqrt(s / 1e9) * 1e6), s))
    got = {r["label"]: r for r in q_embedding_norm_audit(spark, SF).collect()}
    assert set(got) == set(per_label)
    for lbl, vecs in per_label.items():
        norms = [nm for nm, _ in vecs]
        g = got[lbl]
        assert g["n_vecs"] == len(vecs)
        assert g["min_norm_micro"] == min(norms)
        assert g["max_norm_micro"] == max(norms)
        assert g["avg_norm_micro"] == (2 * sum(norms) + len(norms)) // (
            2 * len(norms)
        )
        assert g["zero_vecs"] == sum(1 for _, s in vecs if s == 0)
        # synthetic embeddings are non-degenerate: no label collapses
        assert g["zero_vecs"] == 0 and g["max_norm_micro"] > 0


def test_embedding_norm_audit_plan_joinless(spark):
    p = _plan_of(q_embedding_norm_audit(spark, SF))
    assert "Join" not in p and "CartesianProduct" not in p
    assert "Generate" in p  # the posexplode feeds partial aggs, not a window


# ---------------------------------------------------------------------------
# clustering_depth
# ---------------------------------------------------------------------------


def test_clustering_depth_matches_naive(spark):
    rows = Q._t(spark, SF, "documents").select("doc_id", "n_chars").collect()
    zones = collections.defaultdict(lambda: [None, None])
    for r in rows:
        h16 = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:4], 16)
        for layout, fid in (
            ("hash", h16 % _ZM_FILES),
            ("bychars", int(r["n_chars"]) // _ZM_WIDTH),
        ):
            z = zones[(layout, fid)]
            n = int(r["n_chars"])
            z[0] = n if z[0] is None else min(z[0], n)
            z[1] = n if z[1] is None else max(z[1], n)
    want = {}
    for layout in ("hash", "bychars"):
        zs = [v for (l, _), v in zones.items() if l == layout]
        depth = max(
            sum(1 for zmin, zmax in zs if zmin <= p <= zmax)
            for zmin, zmax in zs
            for p in (zmin, zmax)
        )
        want[layout] = (len(zs), depth)
    got = {r["layout"]: r for r in q_clustering_depth(spark, SF).collect()}
    assert set(got) == {"hash", "bychars"}
    for layout, (n_files, depth) in want.items():
        assert got[layout]["n_files"] == n_files
        assert got[layout]["max_depth"] == depth
    # the metric's point: value-bucketed files never overlap, hash files
    # interleave the full value domain
    assert got["bychars"]["max_depth"] == 1
    assert got["hash"]["max_depth"] == got["hash"]["n_files"]


def test_clustering_depth_plan_no_cartesian(spark):
    p = _plan_of(q_clustering_depth(spark, SF))
    assert "CartesianProduct" not in p
    assert "Window" in p  # the bounded per-position sweep


# ---------------------------------------------------------------------------
# link_prediction_jaccard
# ---------------------------------------------------------------------------


def _naive_link_prediction(spark):
    sh_docs = collections.defaultdict(set)
    for doc, shs in _doc_shingles(spark).items():
        for sh in shs:
            sh_docs[sh].add(doc)
    shared = collections.Counter()
    for docs in sh_docs.values():
        if len(docs) > _LP_SH_CAP:
            continue
        for a, b in itertools.combinations(sorted(docs), 2):
            shared[(a, b)] += 1
    e0 = {p for p, n in shared.items() if n >= _LP_MIN_SHARED}
    deg0 = collections.Counter()
    for a, b in e0:
        deg0[a] += 1
        deg0[b] += 1
    hubs = {v for v, d in deg0.items() if d > _LP_DEG_CAP}
    e = {(a, b) for a, b in e0 if a not in hubs and b not in hubs}
    adj = collections.defaultdict(set)
    for a, b in e:
        adj[a].add(b)
        adj[b].add(a)
    out = {}
    for b, c in itertools.combinations(sorted(adj), 2):
        cn = len(adj[b] & adj[c])
        if cn >= _LP_MIN_COMMON and (b, c) not in e:
            out[(b, c)] = (
                cn,
                round(cn / (len(adj[b]) + len(adj[c]) - cn), 6),
            )
    return out


def test_link_prediction_matches_naive(spark):
    want = _naive_link_prediction(spark)
    got = {
        (r["doc_a"], r["doc_b"]): (r["common_neighbors"], round(r["jaccard"], 6))
        for r in q_link_prediction_jaccard(spark, SF).collect()
    }
    assert got == want
    assert len(got) > 0  # the weak-tie graph must keep open wedges
    for (a, b), (cn, j) in got.items():
        assert a < b and cn >= _LP_MIN_COMMON and 0 < j <= 1


def test_link_prediction_proposals_are_non_edges(spark):
    # no proposed pair is itself an edge of the substrate graph
    want = _naive_link_prediction(spark)
    sh_docs = collections.defaultdict(set)
    for doc, shs in _doc_shingles(spark).items():
        for sh in shs:
            sh_docs[sh].add(doc)
    shared = collections.Counter()
    for docs in sh_docs.values():
        if len(docs) <= _LP_SH_CAP:
            for a, b in itertools.combinations(sorted(docs), 2):
                shared[(a, b)] += 1
    e0 = {p for p, n in shared.items() if n >= _LP_MIN_SHARED}
    assert not (set(want) & e0)


def test_link_prediction_plan_no_cartesian(spark):
    p = _plan_of(q_link_prediction_jaccard(spark, SF))
    assert "CartesianProduct" not in p


# ---------------------------------------------------------------------------
# role_balance
# ---------------------------------------------------------------------------


def test_role_balance_matches_naive(spark):
    rows = _turns(spark, SF).collect()
    agg = collections.defaultdict(lambda: [0, 0, 0, 0])  # n, at, atok, utok
    for r in rows:
        nt = len(r["text"].split(" "))
        a = agg[r["conv_id"]]
        a[0] += 1
        if r["role"] == "assistant":
            a[1] += 1
            a[2] += nt
        else:
            a[3] += nt
    got = {r["conv_id"]: r for r in q_role_balance(spark, SF).collect()}
    assert set(got) == set(agg)
    for conv, (n, at, atok, utok) in agg.items():
        g = got[conv]
        assert (g["n_turns"], g["assistant_turns"]) == (n, at)
        assert (g["assistant_tokens"], g["user_tokens"]) == (atok, utok)
        tot = atok + utok
        want = (
            None
            if tot == 0
            else ((2000000 * atok + tot) // (2 * tot)) / 1e6
        )
        assert g["assistant_share"] == want
        if want is not None:
            assert 0.0 <= g["assistant_share"] <= 1.0


def test_role_balance_plan_joinless_single_agg(spark):
    p = _plan_of(q_role_balance(spark, SF))
    assert "Join" not in p and "Window" not in p


# ---------------------------------------------------------------------------
# ngram_topk_coverage
# ---------------------------------------------------------------------------


def test_ngram_topk_coverage_matches_naive(spark):
    occ = collections.Counter()
    for shs in _doc_shingles(spark).values():
        for sh in shs:
            occ[sh] += 1
    counts = sorted(occ.values(), reverse=True)
    total = sum(counts)
    got = {r["k"]: r for r in q_ngram_topk_coverage(spark, SF).collect()}
    assert set(got) == set(_COV_KS)
    prev_cov = 0.0
    for k in sorted(_COV_KS):
        covered = sum(counts[:k])
        g = got[k]
        assert g["shingles_used"] == min(k, len(counts))
        assert g["covered_occ"] == covered
        want = ((2000000 * covered + total) // (2 * total)) / 1e6
        assert g["coverage"] == want
        assert prev_cov <= g["coverage"] <= 1.0  # monotone in k
        prev_cov = g["coverage"]
    assert got[max(_COV_KS)]["coverage"] <= 1.0


def test_ngram_topk_coverage_tie_exactness(spark):
    # any k cutting inside a tie block must equal the ranked sum — i.e.
    # the block formula is insensitive to which equal-count shingles a
    # ranked version would pick (they all contribute the same c)
    occ = collections.Counter()
    for shs in _doc_shingles(spark).values():
        for sh in shs:
            occ[sh] += 1
    counts = sorted(occ.values(), reverse=True)
    for k in _COV_KS:
        if k < len(counts) and counts[k - 1] == counts[k]:
            break
    else:
        return  # no tie straddles any k on this fixture; nothing to pin
    got = {r["k"]: r for r in q_ngram_topk_coverage(spark, SF).collect()}
    assert got[k]["covered_occ"] == sum(counts[:k])


def test_ngram_topk_coverage_plan_bounded_window(spark):
    p = _plan_of(q_ngram_topk_coverage(spark, SF))
    assert "CartesianProduct" not in p
    # the global window runs over the compressed histogram, after two
    # partial-aggregated passes
    assert "Window" in p and p.count("HashAggregate") >= 4
