"""Tests for the round-5 distributed robust-scale twins: the value-
search selections must reproduce the O(n²) scaffolds bit-for-bit on
the fixture, match brute force on synthetic edge-case groups (n = 1,
2, 3, all-equal values), and follow the scaffolds' row-emission rules
(no Qn row for n ≤ 1, no Sn row for n < 3).  The DuckDB value-hash
gate is scripts/check_queries.py (same oracles as the scaffolds)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from occular_ocr_spark.queries import release_persists
from occular_ocr_spark.queries_robustscale import (
    q_hodges_lehmann,
    q_qn_scale,
    q_sn_scale,
)
from occular_ocr_spark.queries_robustscale_dist import (
    q_hodges_lehmann_dist,
    q_qn_scale_dist,
    q_sn_scale_dist,
)

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


@pytest.mark.parametrize(
    "scaffold,dist,cols",
    [
        (q_hodges_lehmann, q_hodges_lehmann_dist, ["lang", "n_pairs", "hl_x2", "hl_point"]),
        (q_qn_scale, q_qn_scale_dist, ["lang", "n_docs", "h", "k", "qn_raw"]),
        (q_sn_scale, q_sn_scale_dist, ["lang", "n_docs", "sn_raw"]),
    ],
    ids=["hl", "qn", "sn"],
)
def test_dist_equals_scaffold_on_fixture(spark, scaffold, dist, cols):
    try:
        assert _rows(dist(spark, SF), cols) == _rows(scaffold(spark, SF), cols)
    finally:
        release_persists()


# ---------------------------------------------------------------------------
# synthetic edge-case groups
# ---------------------------------------------------------------------------

_EDGE = {
    "one": [7],  # n=1: HL row (w=2x), no Qn (k=0), no Sn (n<3)
    "two": [3, 9],  # n=2: HL + Qn rows, no Sn (inner rank 2 > n-1 gaps)
    "three": [1, 5, 20],  # n=3: everything emits
    "flat": [4, 4, 4, 4],  # zero-range group: search converges at lo
    "mix": [10, 10, 12, 40, 41, 41, 100],  # ties + outlier
}


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("robust_edge")
    rows = []
    i = 0
    for lang, xs in _EDGE.items():
        for x in xs:
            rows.append({"doc_id": i, "lang": lang, "n_chars": x})
            i += 1
    pd.DataFrame(rows).to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


def _brute(xs):
    n = len(xs)
    walsh = sorted(xs[i] + xs[j] for i in range(n) for j in range(i, n))
    hl_x2 = walsh[(len(walsh) + 1) // 2 - 1]
    out = {"hl": (n * (n + 1) // 2, hl_x2, (2 * hl_x2 + 2) // 4)}
    gaps = sorted(abs(xs[i] - xs[j]) for i in range(n) for j in range(i + 1, n))
    k = ((n // 2 + 1) * (n // 2)) // 2
    out["qn"] = gaps[k - 1] if k >= 1 else None
    h = n // 2 + 1
    if n - 1 >= h:
        himeds = sorted(
            sorted(abs(x - y) for j, y in enumerate(xs) if j != i)[h - 1]
            for i, x in enumerate(xs)
        )
        out["sn"] = himeds[(n + 1) // 2 - 1]
    else:
        out["sn"] = None
    return out


def test_edge_groups_match_brute_force(spark, edge_dir):
    try:
        hl = {r["lang"]: r for r in q_hodges_lehmann_dist(spark, edge_dir).collect()}
        qn = {r["lang"]: r for r in q_qn_scale_dist(spark, edge_dir).collect()}
        sn = {r["lang"]: r for r in q_sn_scale_dist(spark, edge_dir).collect()}
    finally:
        release_persists()
    for lang, xs in _EDGE.items():
        want = _brute(xs)
        assert (hl[lang]["n_pairs"], hl[lang]["hl_x2"], hl[lang]["hl_point"]) == want["hl"], lang
        if want["qn"] is None:
            assert lang not in qn, lang
        else:
            assert qn[lang]["qn_raw"] == want["qn"], lang
        if want["sn"] is None:
            assert lang not in sn, lang
        else:
            assert sn[lang]["sn_raw"] == want["sn"], lang


def test_flat_group_zero_scale(spark, edge_dir):
    """All-equal group: Qn and Sn are exactly 0, HL is 2x."""
    try:
        qn = {r["lang"]: r["qn_raw"] for r in q_qn_scale_dist(spark, edge_dir).collect()}
        sn = {r["lang"]: r["sn_raw"] for r in q_sn_scale_dist(spark, edge_dir).collect()}
        hl = {r["lang"]: r["hl_x2"] for r in q_hodges_lehmann_dist(spark, edge_dir).collect()}
    finally:
        release_persists()
    assert qn["flat"] == 0 and sn["flat"] == 0 and hl["flat"] == 8
