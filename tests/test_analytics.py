"""Analytics catalog (gap-fill / mixture sample / sorted-neighborhood /
vocab encode / prefix-filter join): algorithmic-invariant tests.
Gate-level value-hash equality vs DuckDB is covered by
scripts/check_queries.py; these pin the properties the oracles can't
state (completeness vs brute force, density, bijectivity)."""

from __future__ import annotations

import itertools

import pytest

from occular_ocr_spark.queries_analytics import (
    _FJ_CAP,
    _PPJ_CAP,
    _PPJ_DEN,
    _PPJ_NUM,
    _SN_W,
    q_fuzzy_join_del1,
    q_jaccard_prefix_filter,
    q_mix_apply_sample,
    q_sorted_neighborhood,
    q_ts_gapfill,
    q_vocab_encode,
)

SF = "/root/testdata/sf0.001"


def test_ts_gapfill_is_dense_and_filled(spark):
    rows = q_ts_gapfill(spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for days in by_user.values():
        days.sort(key=lambda r: r["day"])
        # dense calendar: consecutive days, no gaps
        for a, b in zip(days, days[1:]):
            assert (b["day"] - a["day"]).days == 1
        # forward fill: value_ff never null after the first observed day
        # (the first day of the span is observed by construction)
        assert days[0]["value_ff"] is not None
        assert all(r["value_ff"] is not None for r in days)
        # observed days carry their own sum: n_events > 0 => ff advances
        assert any(r["n_events"] > 0 for r in days)


def test_mix_apply_sample_rebalances(spark):
    kept = q_mix_apply_sample(spark, SF).groupBy("lang").count().collect()
    from occular_ocr_spark.queries import _t

    orig = {
        r["lang"]: r["count"]
        for r in _t(spark, SF, "documents").groupBy("lang").count().collect()
    }
    kept_map = {r["lang"]: r["count"] for r in kept}
    total, k = sum(orig.values()), len(orig)
    target = total / k
    for lang, n in orig.items():
        # every language must be sampled at (close to) min(n, target):
        # permille gating is exact in expectation, hash noise is small
        expect = min(n, target)
        assert kept_map.get(lang, 0) <= n
        assert abs(kept_map.get(lang, 0) - expect) <= max(6, 0.35 * expect)
    # languages above target must actually DROP documents
    over = [lang for lang, n in orig.items() if n > 1.2 * target]
    assert all(kept_map[lang] < orig[lang] for lang in over)


def test_sorted_neighborhood_matches_bruteforce(spark):
    from occular_ocr_spark.queries import _t

    docs = _t(spark, SF, "documents").select("doc_id", "text").collect()
    order = sorted((r["text"][:12], r["doc_id"]) for r in docs)
    expected = set()
    for i, (_, a) in enumerate(order):
        for j in range(i + 1, min(i + _SN_W, len(order))):
            expected.add((a, order[j][1], j - i))
    got = {
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in q_sorted_neighborhood(spark, SF).collect()
    }
    assert got == expected


def test_vocab_encode_rank_is_bijective_and_ordered(spark):
    rows = q_vocab_encode(spark, SF).collect()
    assert rows
    ids = sorted({i for r in rows for i in r["ids"] if i >= 0})
    # dense 0..V-1 id space: the two-level rank is a bijection
    assert ids == list(range(len(ids)))
    # every doc decodes to its token count
    from occular_ocr_spark.queries import _t

    texts = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in _t(spark, SF, "documents").select("doc_id", "text").collect()
    }
    for r in rows:
        assert len(r["ids"]) == len(texts[r["doc_id"]])
        assert r["n_oov"] == sum(1 for i in r["ids"] if i == -1)


def _prefix_candidates(docs, cap):
    """Python replay of the blocking stage: global-frequency-ordered
    prefixes of length sz - ceil(3*sz/5) + 1, bucket per prefix token,
    buckets with 2..cap docs emit their pairs (cap=None disables)."""
    freq: dict[str, int] = {}
    for toks in docs.values():
        for t in toks:
            freq[t] = freq.get(t, 0) + 1
    buckets: dict[str, list] = {}
    for d, toks in docs.items():
        sz = len(toks)
        plen = sz - (3 * sz + 4) // 5 + 1
        for t in sorted(toks, key=lambda t: (freq[t], t))[:plen]:
            buckets.setdefault(t, []).append(d)
    cands = set()
    for ds in buckets.values():
        if len(ds) < 2 or (cap is not None and len(ds) > cap):
            continue
        cands.update(itertools.combinations(sorted(ds), 2))
    return cands


def test_prefix_filter_matches_blocking_model_and_theorem(spark):
    """Two properties the hash gate can't state: (1) the Spark join
    equals an independent Python replay of capped-blocking + exact
    verify (the synthetic corpus's tiny vocabulary makes hot prefix
    tokens df≈380 at sf0.001, so the df cap DOES bite — by design,
    mirrored in the oracle); (2) the prefix-filter THEOREM — with the
    cap removed, blocking loses no qualifying pair vs brute force."""
    from occular_ocr_spark.queries import _t

    docs = {
        r["doc_id"]: frozenset(t for t in r["text"].split(" ") if t)
        for r in _t(spark, SF, "documents").select("doc_id", "text").collect()
    }

    def qualifies(a, b):
        o = len(docs[a] & docs[b])
        return (_PPJ_NUM + _PPJ_DEN) * o >= _PPJ_NUM * (
            len(docs[a]) + len(docs[b])
        )

    expected = {
        (a, b)
        for a, b in _prefix_candidates(docs, _PPJ_CAP)
        if qualifies(a, b)
    }
    got = {
        (r["doc_a"], r["doc_b"])
        for r in q_jaccard_prefix_filter(spark, SF).collect()
    }
    assert got == expected, (
        f"missing={sorted(expected - got)[:5]} extra={sorted(got - expected)[:5]}"
    )

    brute = {
        (a, b)
        for a, b in itertools.combinations(sorted(docs), 2)
        if qualifies(a, b)
    }
    # exact verify => no false positives ever
    assert got <= brute
    # theorem: uncapped prefix blocking is COMPLETE
    uncapped = _prefix_candidates(docs, None)
    assert brute <= uncapped


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a):
        cur = [i + 1]
        for j, cb in enumerate(b):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_join_del1_equals_bruteforce(spark):
    """Deletion-neighborhood blocking is provably COMPLETE for ed<=1
    and the verify is exact, so (cap permitting — sig buckets here are
    <= 10-way digit groups, far under _FJ_CAP) the join must equal the
    all-pairs Levenshtein join."""
    from occular_ocr_spark.queries import _t

    names = {
        r["c_custkey"]: r["c_name"]
        for r in _t(spark, SF, "customer").select("c_custkey", "c_name").collect()
    }
    expected = {
        (a, b, _lev(names[a], names[b]))
        for a, b in itertools.combinations(sorted(names), 2)
        if _lev(names[a], names[b]) <= 1
    }
    got = {
        (r["cust_a"], r["cust_b"], r["dist"])
        for r in q_fuzzy_join_del1(spark, SF).collect()
    }
    assert got == expected
    assert got, "sf0.001 customer names must contain ed<=1 pairs"
    assert _FJ_CAP >= 11  # a full 10-digit bucket must never be dropped


def test_ann_recall_eval_matches_bruteforce_python(spark):
    """Per-query hits must equal the Python-computed overlap between
    exact cosine top-k and IVF-probed top-k on the real corpus, with
    identical rounding and (cos DESC, vec_id) tie-break."""
    import numpy as np

    from occular_ocr_spark.queries import (
        _ANN_EVAL_K,
        _ANN_EVAL_Q,
        _IVF_K,
        _IVF_NPROBE,
        _t,
        q_ann_recall_eval,
    )

    rows = {
        int(r["vec_id"]): np.array([float(v) for v in r["embedding"]])
        for r in _t(spark, SF, "embeddings").collect()
    }
    cents = {c: rows[c] for c in range(_IVF_K) if c in rows}
    norms = {k: float(np.sqrt(np.sum(v * v))) for k, v in rows.items()}
    assign = {
        k: min(cents, key=lambda c: (float(np.sum((v - cents[c]) ** 2)), c))
        for k, v in rows.items()
    }
    expected = {}
    for q in range(_ANN_EVAL_Q):
        qv, qn = rows[q], norms[q]
        scored = {
            k: round(float(np.dot(v, qv)) / (norms[k] * qn), 6)
            for k, v in rows.items()
            if k != q
        }
        rank = sorted(scored, key=lambda k: (-scored[k], k))
        exact = set(rank[:_ANN_EVAL_K])
        probes = sorted(
            cents, key=lambda c: (float(np.sum((qv - cents[c]) ** 2)), c)
        )[:_IVF_NPROBE]
        cand = [k for k in rank if assign[k] in probes]
        expected[q] = len(exact & set(cand[:_ANN_EVAL_K]))

    got = {
        int(r["query_id"]): int(r["hits"])
        for r in q_ann_recall_eval(spark, SF).collect()
    }
    assert got == expected
    assert any(h > 0 for h in got.values()), "probed lists must hit"


def test_assoc_rules_bruteforce_and_symmetry(spark):
    from occular_ocr_spark.queries_analytics import _AR_MIN_SUPPORT, q_assoc_rules
    import itertools

    import pandas as pd

    SF = "/root/testdata/sf0.001"
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["day"] = ev["ts"].dt.date
    baskets = ev.groupby(["user_id", "day"])["event_type"].apply(set)
    nb = len(baskets)
    from collections import Counter

    singles: Counter = Counter()
    pairs: Counter = Counter()
    for s in baskets:
        for t in s:
            singles[t] += 1
        for a, b in itertools.combinations(sorted(s), 2):
            pairs[(a, b)] += 1
    rows = q_assoc_rules(spark, SF).collect()
    got = {(r["ante"], r["cons"]): r for r in rows}
    want_pairs = {p: c for p, c in pairs.items() if c >= _AR_MIN_SUPPORT}
    assert set(got) == {(a, b) for a, b in want_pairs} | {
        (b, a) for a, b in want_pairs
    }
    for (a, b), c in want_pairs.items():
        ra, rb = got[(a, b)], got[(b, a)]
        assert ra["support"] == rb["support"] == c
        assert ra["confidence"] == round(c / singles[a], 6)
        assert rb["confidence"] == round(c / singles[b], 6)
        # lift is symmetric
        assert ra["lift"] == rb["lift"]
        assert ra["lift"] == round(c * nb / (singles[a] * singles[b]), 6)
