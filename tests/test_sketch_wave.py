"""Semantics tests for the wave-20 entries: containment_join
(asymmetric set containment with directional prefix filtering) and
bloom_probe (Bloom-filter build + probe + audit).  The DuckDB
value-hash gate is scripts/check_queries.py; these pin each op
against an independent single-node recomputation plus plan shapes."""

from __future__ import annotations

import contextlib
import hashlib
import io

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries import _t
from occular_ocr_spark.queries_analytics import (
    _CJ_CAP,
    _CJ_DEN,
    _CJ_NUM,
    q_containment_join,
)
from occular_ocr_spark.queries_scale import (
    _BLOOM_BITS,
    _BLOOM_K,
    _BLOOM_MEMBER_LANG,
    _BLOOM_WORDS,
    q_bloom_probe,
)

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# containment_join
# ---------------------------------------------------------------------------


def _token_sets(spark):
    out = {}
    for r in _t(spark, SF, "documents").select("doc_id", "text").collect():
        words = (r["text"] or "").split(" ")
        out[r["doc_id"]] = {
            " ".join(words[i : i + 3]) for i in range(len(words) - 2)
        }
    return out


def test_containment_join_matches_capped_naive(spark):
    sets = _token_sets(spark)
    # global token df for prefix order and the postings cap
    df_count = {}
    for toks in sets.values():
        for t in toks:
            df_count[t] = df_count.get(t, 0) + 1
    capped_tokens = {t for t, c in df_count.items() if c <= _CJ_CAP}

    def prefix(doc):
        toks = sorted(sets[doc], key=lambda t: (df_count[t], t))
        sz = len(toks)
        keep = sz - ((_CJ_NUM * sz + _CJ_DEN - 1) // _CJ_DEN) + 1
        return set(toks[:keep])

    want = {}
    for a in sets:
        if not sets[a]:
            continue
        block = prefix(a) & capped_tokens
        cands = {
            b
            for b in sets
            if b != a and block & sets[b]
        }
        for b in cands:
            o = len(sets[a] & sets[b])
            if _CJ_DEN * o >= _CJ_NUM * len(sets[a]):
                want[(a, b)] = round(o / len(sets[a]), 6)
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in q_containment_join(spark, SF).collect()
    }
    assert got.keys() == want.keys()
    for k, v in want.items():
        assert abs(got[k] - v) <= 5e-7
        assert _CJ_NUM / _CJ_DEN - 1e-9 <= got[k] <= 1.0
    assert want, "fixture near-dups must produce containment pairs"
    Q.release_persists()


def test_containment_is_directional(spark):
    rows = q_containment_join(spark, SF).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    # asymmetric: at least one directed pair's reverse is absent OR
    # present with a different value on fixtures with unequal sizes
    sets = _token_sets(spark)
    asym = [
        (a, b)
        for a, b in pairs
        if len(sets[a]) != len(sets[b])
    ]
    assert asym or not pairs
    Q.release_persists()


# ---------------------------------------------------------------------------
# bloom_probe
# ---------------------------------------------------------------------------


def _positions(doc_id):
    out = []
    for i in range(_BLOOM_K):
        h = int(
            hashlib.md5(f"{doc_id}:b{i}".encode()).hexdigest()[:4], 16
        ) % (_BLOOM_WORDS * _BLOOM_BITS)
        out.append(h)
    return out


def test_bloom_probe_matches_naive(spark):
    docs = {
        r["doc_id"]: r["lang"]
        for r in _t(spark, SF, "documents").select("doc_id", "lang").collect()
    }
    bits = set()
    for d, lang in docs.items():
        if lang == _BLOOM_MEMBER_LANG:
            bits.update(_positions(d))
    cells = {}
    for d, lang in docs.items():
        is_member = lang == _BLOOM_MEMBER_LANG
        ok = all(p in bits for p in _positions(d))
        key = is_member
        n, npass = cells.get(key, (0, 0))
        cells[key] = (n + 1, npass + (1 if ok else 0))
    got = {r["is_member"]: r for r in q_bloom_probe(spark, SF).collect()}
    assert set(got) == set(cells)
    for k, (n, npass) in cells.items():
        assert got[k]["n_docs"] == n
        assert got[k]["n_bloom_pass"] == npass
        assert got[k]["n_bloom_reject"] == n - npass


def test_bloom_no_false_negatives(spark):
    got = {r["is_member"]: r for r in q_bloom_probe(spark, SF).collect()}
    assert got[True]["n_bloom_reject"] == 0  # Bloom guarantee
    # the 1024-bit/k=3 filter must actually reject most non-members
    nm = got[False]
    assert nm["n_bloom_reject"] > nm["n_bloom_pass"]


def test_bloom_plan_broadcasts_filter(spark):
    p = _plan_of(q_bloom_probe(spark, SF))
    assert "BroadcastHashJoin" in p  # the 32-row filter side
    assert "SortMergeJoin" not in p
