"""Drift & corpus-hygiene catalog (PSI / KS / boilerplate / corr /
blocklist / z-score): algorithmic invariants on the Spark side.
Gate-level value-hash equality vs DuckDB is covered by
scripts/check_queries.py (the driver mirror)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from occular_ocr_spark.queries_drift import (
    _BLOCKLIST,
    _KS_BUCKET,
    _PSI_BINS,
    _Z_THRESH,
    q_boilerplate_scrub,
    q_corr_matrix,
    q_domain_blocklist,
    q_ks_statistic,
    q_psi_drift,
    q_zscore_outliers,
)

SF = "/root/testdata/sf0.001"


def test_psi_drift_contribs_sum_to_psi_and_bins_bounded(spark):
    rows = q_psi_drift(spark, SF).collect()
    assert 1 <= len(rows) <= _PSI_BINS
    for r in rows:
        assert 0 <= r.bin < _PSI_BINS
        # Laplace smoothing keeps both probabilities strictly positive
        assert r.p_ref > 0 and r.p_cur > 0
        # each contribution is non-negative: (p-q) and ln(p/q) share sign
        assert r.psi_contrib >= 0
    # probabilities of the POPULATED bins sum to <= 1 (empty bins keep
    # their smoothing mass)
    assert sum(r.p_ref for r in rows) <= 1.0 + 1e-9
    assert sum(r.p_cur for r in rows) <= 1.0 + 1e-9


def test_ks_statistic_matches_numpy_ecdf(spark):
    row = q_ks_statistic(spark, SF).collect()
    assert len(row) == 1
    r = row[0]
    # recompute D brute-force from the raw parquet
    import pandas as pd

    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev.value.notna()]
    cents = np.floor(ev.value.to_numpy() * 100 + 0.5).astype(np.int64)
    a = np.sort(cents[(ev.user_id % 2 == 0).to_numpy()])
    b = np.sort(cents[(ev.user_id % 2 == 1).to_numpy()])
    assert (r.n_a, r.n_b) == (len(a), len(b))
    grid = np.unique(cents)
    fa = np.searchsorted(a, grid, side="right")
    fb = np.searchsorted(b, grid, side="right")
    d_num = int(np.max(np.abs(fa.astype(object) * len(b) - fb.astype(object) * len(a))))
    assert r.d_num == d_num
    assert r.d_stat == pytest.approx(d_num / (len(a) * len(b)), abs=1e-6)


def test_ks_bucket_decomposition_is_exact(spark):
    """The two-level prefix sum must agree with the single-window ECDF
    regardless of where bucket boundaries fall."""
    assert _KS_BUCKET > 1  # decomposition actually splits the range
    r = q_ks_statistic(spark, SF).collect()[0]
    assert 0 <= r.d_stat <= 1


def test_boilerplate_scrub_flags_injected_footer_and_header(spark):
    rows = q_boilerplate_scrub(spark, SF).collect()
    assert rows, "injected boilerplate must be detected"
    sents = {r.sentence for r in rows}
    # the ~75%-of-docs footer must be flagged for at least one source
    assert any(s.startswith("(c) ") and s.endswith("rights reserved") for s in sents)
    for r in rows:
        assert r.n_docs >= 3
        assert r.n_docs * 10 >= r.src_docs * 2
        assert r.doc_share == pytest.approx(r.n_docs / r.src_docs, abs=1e-6)


def test_corr_matrix_is_valid_correlation(spark):
    rows = q_corr_matrix(spark, SF).collect()
    assert len(rows) == 6  # C(4,2) unordered pairs
    pairs = {(r.col_a, r.col_b) for r in rows}
    assert len(pairs) == 6  # each unordered pair exactly once
    assert not any((b, a) in pairs for a, b in pairs)
    for r in rows:
        assert -1.0 - 1e-9 <= r.corr <= 1.0 + 1e-9
    # cross-check one pair against numpy at float64
    import pandas as pd

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    qc = np.floor(li.l_quantity.to_numpy() * 100 + 0.5)
    ec = np.floor(li.l_extendedprice.to_numpy() * 100 + 0.5)
    want = np.corrcoef(qc, ec)[0, 1]
    got = next(
        r.corr
        for r in rows
        if {r.col_a, r.col_b} == {"l_extendedprice", "l_quantity"}
    )
    assert got == pytest.approx(want, abs=1e-5)


def test_domain_blocklist_suffix_semantics(spark):
    rows = q_domain_blocklist(spark, SF).collect()
    assert rows
    for r in rows:
        # suffix match: the host equals the entry or ends with ".entry"
        assert r.host == r.matched or r.host.endswith("." + r.matched)
        assert r.matched in _BLOCKLIST
    matched = {r.matched for r in rows}
    # the subdomain-tree entry and the exact-host entry both fire
    assert "news.example.com" in matched
    assert "h5.example.org" in matched
    # no host matched via a bare TLD (suffixes need >= 2 labels)
    assert all(len(r.matched.split(".")) >= 2 for r in rows)


def test_zscore_outliers_thresholded_and_exact(spark):
    rows = q_zscore_outliers(spark, SF).collect()
    for r in rows:
        assert abs(r.z) > _Z_THRESH
    # recompute one event_type's stats brute force
    import pandas as pd

    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev.value.notna()]
    ev["vc"] = np.floor(ev.value.to_numpy() * 100 + 0.5).astype(np.int64)
    by_type = {r.event_id: r for r in rows}
    for et, g in ev.groupby("event_type"):
        mean = g.vc.mean()
        std = math.sqrt(((g.vc - mean) ** 2).mean())
        for _, e in g.iterrows():
            z = (e.vc - mean) / std
            if abs(z) > _Z_THRESH:
                assert e.event_id in by_type, (et, e.event_id, z)
                assert by_type[e.event_id].z == pytest.approx(z, abs=1e-5)
            else:
                assert e.event_id not in by_type


def test_dataset_card_stats_consistency(spark):
    from occular_ocr_spark.queries_drift import q_dataset_card_stats

    rows = q_dataset_card_stats(spark, SF).collect()
    import pandas as pd

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert len(rows) == docs.source.nunique()
    assert sum(r.n_docs for r in rows) == len(docs)
    for r in rows:
        assert 0 <= r.dup_docs <= r.n_docs
        assert r.dup_ratio == pytest.approx(r.dup_docs / r.n_docs, abs=1e-6)
        assert r.n_langs >= 1
        assert r.total_tokens >= r.n_docs  # every doc counts >= 1 token


def test_cross_dedup_sources_pair_accounting(spark):
    from occular_ocr_spark.queries_drift import q_cross_dedup_sources

    rows = q_cross_dedup_sources(spark, SF).collect()
    assert rows
    import pandas as pd

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    # synthesized mirror pairs: each doc_id%7==0 doc pairs its source
    # with 'mirror' once per in-source copy — docs also divisible by 11
    # carry a second in-source copy, so they contribute 2
    # (texts are unique at this SF, so copies come only from synthesis)
    sub = docs[docs.doc_id % 7 == 0]
    m = (1 + (sub.doc_id % 11 == 0)).groupby(sub.source).sum()
    got_mirror = {
        (r.src_a, r.src_b): r.n_doc_pairs
        for r in rows
        if "mirror" in (r.src_a, r.src_b)
    }
    for src, n in m.items():
        a, b = sorted([src, "mirror"])
        assert got_mirror[(a, b)] == n, (src, n)
    # diagonal: docs with doc_id%11==0 contribute C(2,2)=1 pair each
    s = docs[docs.doc_id % 11 == 0].groupby("source").size()
    got_diag = {r.src_a: r.n_doc_pairs for r in rows if r.src_a == r.src_b}
    for src, n in s.items():
        assert got_diag.get(src, 0) >= n
    for r in rows:
        assert r.src_a <= r.src_b  # canonical orientation
        assert r.n_doc_pairs > 0
