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


# ---------------------------------------------------------------------------
# Rolling-window kernel (queries_scale._rolling_group_kernel)
# ---------------------------------------------------------------------------

from occular_ocr_spark.queries_scale import (  # noqa: E402
    _ROLL_WINDOW_US,
    _int8_quantize_scorer,
    _rolling_group_kernel,
)


def _brute_rolling(ts, vals, win):
    """O(n^2) reference of RANGE BETWEEN -win AND CURRENT ROW with
    ties-as-peers semantics (all rows with equal ts share a frame)."""
    out_n, out_m = [], []
    for i in range(len(ts)):
        idx = [j for j in range(len(ts)) if ts[i] - win <= ts[j] <= ts[i]]
        out_n.append(len(idx))
        out_m.append(max(vals[j] for j in idx))
    return out_n, out_m


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            # small ts range on purpose: forces duplicates (peer ties)
            st.integers(min_value=0, max_value=20),
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=0, max_value=25),
)
def test_rolling_kernel_matches_bruteforce(rows, win_raw):
    win = win_raw  # window in the same (tiny) ts units
    import occular_ocr_spark.queries_scale as qs

    ts = [r[0] for r in rows]
    vals = [r[1] for r in rows]
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "event_type": "t",
            "ts_us": np.asarray(ts, dtype=np.int64),
            "value": np.asarray(vals, dtype=np.float64),
            "shift": np.zeros(len(rows), dtype=np.int64),
        }
    )
    orig = qs._ROLL_WINDOW_US
    qs._ROLL_WINDOW_US = win
    try:
        got = _rolling_group_kernel(pdf)
    finally:
        qs._ROLL_WINDOW_US = orig
    got = got.sort_values("event_id").reset_index(drop=True)
    # brute force in the kernel's sort order is irrelevant: results are
    # per-event, so compare by event_id
    bn, bm = _brute_rolling(ts, vals, win)
    for i in range(len(rows)):
        row = got[got["event_id"] == i].iloc[0]
        assert row["n_7d"] == bn[i], (i, ts, win)
        assert row["max_7d"] == np.round(bm[i], 6), (i, ts, win)


def test_rolling_kernel_drops_context_rows():
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "event_type": ["t"] * 3,
            "ts_us": np.asarray([10, 20, 30], dtype=np.int64),
            "value": [1.0, 2.0, 3.0],
            "shift": np.asarray([0, 1, 0], dtype=np.int64),
        }
    )
    out = _rolling_group_kernel(pdf)
    # the context copy (shift=1) participates in frames but is not emitted
    assert sorted(out["event_id"]) == [1, 3]
    assert out[out["event_id"] == 3]["n_7d"].iloc[0] == 3  # includes ctx row


# ---------------------------------------------------------------------------
# Int8 quantization scorer (queries_scale._int8_quantize_scorer)
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.lists(_finite, min_size=4, max_size=16))
def test_int8_quantizer_codes_bounded_and_exact(vec):
    dim = len(vec)
    qq = np.ones(dim)  # query codes: all-ones -> qdot = sum of codes
    scorer = _int8_quantize_scorer(qq)
    pdf = pd.DataFrame({"vec_id": [7], "emb": [vec]})
    out = next(iter(scorer(iter([pdf]))))
    v = np.asarray(vec, dtype=np.float64)
    s = float(np.max(np.abs(v))) if v.size else 0.0
    if s == 0.0:
        assert out["qdot"].iloc[0] == 0
    else:
        codes = np.floor(v * 127.0 / s + 0.5)
        assert np.all(np.abs(codes) <= 127)
        assert out["qdot"].iloc[0] == int(codes.sum())
        assert out["scale"].iloc[0] == round(s, 6)
