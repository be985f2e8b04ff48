"""Property tests for the Arrow-batch numpy kernels (SURVEY §4
dense-math doctrine): pure-Python, no SparkSession — the kernels are
plain batch functions, so their contracts (exact arithmetic, FP
accumulation order, padding semantics) are checkable on arbitrary
inputs, not just the parquet fixtures the oracle gate covers."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from occular_ocr_spark.queries import (
    _FP_BASE,
    _FP_WINDOW,
    _cos_vs_query_scorer,
    _rolling_fingerprints,
)

_finite = st.floats(
    min_value=-100, max_value=100, allow_nan=False, allow_infinity=False, width=64
)


def _vec(dim):
    # sum-of-squares must be nonzero in float64 (subnormals square to 0)
    return st.lists(_finite, min_size=dim, max_size=dim).filter(
        lambda v: sum(x * x for x in v) > 0.0
    )


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_cos_scorer_matches_ordered_reference(data):
    """cos_sim must equal the left-to-right scalar accumulation
    BITWISE — the FP-order contract the DuckDB oracles rely on."""
    dim = data.draw(st.integers(1, 16))
    n = data.draw(st.integers(1, 6))
    q = data.draw(_vec(dim))
    rows = [data.draw(_vec(dim)) for _ in range(n)]
    pdf = pd.DataFrame({"vec_id": list(range(n)), "emb": rows})
    out = next(_cos_vs_query_scorer(q, "emb")(iter([pdf])))
    qn = 0.0
    for v in q:
        qn += float(v) * float(v)
    qn = qn ** 0.5
    for i, r in enumerate(rows):
        acc, nr = 0.0, 0.0
        for j in range(dim):
            acc = acc + float(r[j]) * float(q[j])
            nr = nr + float(r[j]) * float(r[j])
        expect = acc / (float(np.sqrt(nr)) * qn)
        assert float(out["cos_sim"][i]) == expect


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_cos_scorer_precomputed_norm_and_passthrough(data):
    dim = data.draw(st.integers(1, 8))
    r = data.draw(_vec(dim))
    q = data.draw(_vec(dim))
    norm = 0.0
    for v in r:
        norm += float(v) * float(v)
    norm = float(np.sqrt(norm))
    pdf = pd.DataFrame({"vec_id": [7], "tag": ["x"], "emb": [r], "norm": [norm]})
    out = next(
        _cos_vs_query_scorer(q, "emb", norm_col="norm", passthrough=("vec_id", "tag"))(
            iter([pdf])
        )
    )
    assert list(out.columns) == ["vec_id", "tag", "cos_sim"]
    assert int(out["vec_id"][0]) == 7 and out["tag"][0] == "x"


_ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
)
_unicode_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2600), max_size=24
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.one_of(_ascii_text, _unicode_text), min_size=1, max_size=6))
def test_rolling_fingerprints_match_naive_polynomial(texts):
    """np.correlate kernel == the naive per-window Σ code·B^j minimum,
    including the zero-padded short-doc window and the non-ASCII ord
    fallback."""
    got = _rolling_fingerprints(texts)
    for t, g in zip(texts, got):
        codes = [ord(c) for c in t]
        if len(codes) < _FP_WINDOW:
            codes = codes + [0] * (_FP_WINDOW - len(codes))
        naive = min(
            sum(codes[i + j] * _FP_BASE ** j for j in range(_FP_WINDOW))
            for i in range(len(codes) - _FP_WINDOW + 1)
        )
        assert int(g) == naive
