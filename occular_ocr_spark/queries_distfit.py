"""Distribution-fit & sketch-audit catalog, round 4 (wave 54): five
operators around "does this corpus column follow the distribution the
pipeline assumes, and how cheaply can we check at 100 TB" —

* ``jarque_bera`` — the formal normality TEST companion to
  ``moments_profile`` (which reports shape; this one decides): JB =
  n/6·(g₁² + g₂²/4) of the daily event-count series, skewness and
  excess kurtosis from exact DECIMAL(38,0) power sums via the house
  central-moment polynomials.
* ``dickey_fuller`` — unit-root t-test of the daily series
  (Δyₜ = α + γ·yₜ₋₁ + ε, with constant): γ̂ and its t-statistic from
  exact deviation sums over the lag-adjacent pairs; rejection at the
  5% Dickey-Fuller critical value −2.86.  The stationarity companion
  to ``ar1_yulewalker`` (which fits assuming stationarity; this one
  tests it).
* ``sax_symbols`` — SAX symbolization of the daily series: exact
  z-scores zₜ = (n·xₜ−S)/√(n·Σx²−S²) (one sqrt on an exact integer),
  PAA over ``_SAX_W`` equal segments by integer division, 4-letter
  Gaussian-breakpoint alphabet (±0.6745, 0).  The shape-index
  companion to ``ts_decompose`` — a 8-char sketch a catalog can store
  per metric per week.
* ``randomized_response`` — local-DP frequency oracle over
  ``documents.lang``: each row reports its true label with p = 3/4
  else a hash-chosen label (both coins from the portable md5-hex
  trick, so the "noise" is bit-identical on both engines), and the
  estimator de-biases  π̂ᵥ = (fᵥ − (1−p)/k)/p.  Reports estimated vs
  true frequency per label and the ε = ln((p+(1−p)/k)/((1−p)/k))
  budget actually spent.
* ``f2_ams_sketch`` — AMS tug-of-war estimate of the second frequency
  moment (self-join size) of the token stream: ``_F2_R`` independent
  ±1 hash projections zᵣ = Σᵥ fᵥ·sᵣ(v), estimate = median(zᵣ²),
  reported next to the exact F₂ with the realized relative error —
  the error-contract pattern (``approx_distinct``,
  ``minhash_est_error``) applied to join-size estimation.

House contract: DuckDB value-hash oracle with identical aliases (the
SQL is a shared dialect-switched builder, so both engines run the
same text modulo type/function spellings), self-registration into
queries.QUERIES / ORACLES on import, semantics tests plus plan
assertions in tests/test_distfit_wave.py.

Cross-engine float policy: power sums, deviation products, signed
sketch sums and frequency counts are exact DECIMAL(38,0)/BIGINT;
divisions, ln and sqrt finals are row-local IEEE on exact inputs,
micro-quantized (floor(x·1e6+0.5)/1e6) or round(x, 6) at the surface.

Scale notes: ``jarque_bera`` / ``dickey_fuller`` / ``sax_symbols``
collapse the event scan to the ≤ #days frame before any window;
``randomized_response`` is one map-side hash projection + a k-row
broadcast join + a k-row aggregate; ``f2_ams_sketch`` is one
partial-agg token count + one 1-row reduce carrying _F2_R signed sums
simultaneously (the sketch state is R numbers regardless of corpus
size — that is the point).

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import queries as _q

_SAX_W = 8
_F2_R = 5
_RR_SEED = "rr"
_DF_CRIT_5PCT = -2.86


def _dec(dialect: str) -> str:
    return "DECIMAL(38,0)"


def _str_t(dialect: str) -> str:
    return "STRING" if dialect == "spark" else "VARCHAR"


def _hexd(expr: str, j: int) -> str:
    """Value 0-15 of hex digit ``j`` (1-based) of md5(expr)."""
    return f"(instr('0123456789abcdef', substr(md5({expr}), {j}, 1)) - 1)"


_DAILY_SQL = """
daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DECIMAL(38,0)) AS x
  FROM events GROUP BY 1)
"""


# ---------------------------------------------------------------------------
# jarque_bera
# ---------------------------------------------------------------------------


def _jarque_bera_sql(dialect: str) -> str:
    return f"""
WITH {_DAILY_SQL},
s AS (
  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
         sum(x) AS s1, sum(x * x) AS s2,
         sum(x * x * x) AS s3, sum(x * x * x * x) AS s4
  FROM daily),
m AS (
  SELECT CAST(n AS BIGINT) AS n_days,
         CAST(n * s2 - s1 * s1 AS DOUBLE) AS m2,
         CAST(n * n * s3 - 3 * n * s2 * s1 + 2 * s1 * s1 * s1 AS DOUBLE)
           AS m3,
         CAST(n * n * n * s4 - 4 * n * n * s3 * s1
              + 6 * n * s2 * s1 * s1 - 3 * s1 * s1 * s1 * s1 AS DOUBLE)
           AS m4
  FROM s)
SELECT n_days,
       CASE WHEN m2 <= 0 THEN 0.0
            ELSE round(m3 / (m2 * sqrt(m2)), 6) END AS skewness,
       CASE WHEN m2 <= 0 THEN 0.0
            ELSE round(m4 / (m2 * m2) - 3.0, 6) END AS kurtosis_excess,
       CASE WHEN m2 <= 0 THEN 0.0
            ELSE round(CAST(n_days AS DOUBLE) / 6.0 *
                   (  (m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
                    + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0)
                      / 4.0), 6) END AS jb_stat
FROM m
"""


def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test of the daily event-count series.

    Skewness g₁ = m₃/m₂^1.5 and excess kurtosis g₂ = m₄/m₂²−3 come
    from the exact DECIMAL power-sum polynomials (one partial-agg pass
    over the ≤ #days frame); JB = n/6·(g₁² + g₂²/4) is row-local
    double arithmetic on those exact inputs.  Degenerate (zero-
    variance) series report all-zero, documented.

    Scale: the event scan collapses to #days rows before anything
    else; the moment pass is one 1-row reduce.
    """
    _q._register_views(spark, sf_dir, ["events"])
    return spark.sql(_jarque_bera_sql("spark"))


# ---------------------------------------------------------------------------
# dickey_fuller
# ---------------------------------------------------------------------------


def _dickey_fuller_sql(dialect: str) -> str:
    return f"""
WITH {_DAILY_SQL},
idx AS (
  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t, x
  FROM daily),
pair AS (
  SELECT b.x AS xl, a.x - b.x AS dy
  FROM idx a JOIN idx b ON b.t = a.t - 1),
s AS (
  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
         sum(xl) AS sx, sum(dy) AS sy,
         sum(xl * xl) AS sxx, sum(xl * dy) AS sxy, sum(dy * dy) AS syy
  FROM pair),
dev AS (
  SELECT CAST(n AS BIGINT) AS n_obs,
         CAST(n * sxx - sx * sx AS DOUBLE) AS dxx,
         CAST(n * sxy - sx * sy AS DOUBLE) AS dxy,
         CAST(n * syy - sy * sy AS DOUBLE) AS dyy
  FROM s),
fit AS (
  SELECT n_obs, dxx, dyy,
         CASE WHEN dxx = 0 THEN 0.0 ELSE dxy / dxx END AS gamma,
         CASE WHEN dxx = 0 THEN 0.0 ELSE dxy END AS dxy_g
  FROM dev),
tt AS (
  SELECT n_obs, gamma,
         CASE WHEN dxx = 0 OR n_obs <= 2 THEN 0.0
              ELSE (dyy - gamma * dxy_g) / CAST(n_obs AS DOUBLE)
                   / CAST(n_obs - 2 AS DOUBLE) END AS s2,
         dxx
  FROM fit)
SELECT n_obs,
       CAST(floor(gamma * 1e6 + 0.5) AS BIGINT) / 1e6 AS gamma,
       CASE WHEN dxx = 0 OR s2 <= 0 THEN 0.0
            ELSE CAST(floor(gamma / sqrt(s2 * CAST(n_obs AS DOUBLE) / dxx)
                   * 1e6 + 0.5) AS BIGINT) / 1e6 END AS t_stat,
       CASE WHEN dxx = 0 OR s2 <= 0 THEN false
            ELSE gamma / sqrt(s2 * CAST(n_obs AS DOUBLE) / dxx)
                 < {_DF_CRIT_5PCT} END AS unit_root_rejected
FROM tt
"""


def q_dickey_fuller(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller unit-root test (with constant) of the daily
    series: Δyₜ = α + γ·yₜ₋₁ + ε fitted by exact deviation sums over
    lag-adjacent pairs, t = γ̂/se(γ̂), rejected when t < −2.86 (the 5%
    DF critical value with constant).  γ̂ near 0 with a deep-negative
    t means mean-reverting; failing to reject flags a drifting
    (integrated) volume series that invalidates the fixed-trend ops.

    Scale: the lag pairing is a self-join on the ≤ #days frame (t ↔
    t−1), then one 1-row moment reduce; nothing row-shaped is ever
    globally ordered.
    """
    _q._register_views(spark, sf_dir, ["events"])
    return spark.sql(_dickey_fuller_sql("spark"))


# ---------------------------------------------------------------------------
# sax_symbols
# ---------------------------------------------------------------------------


def _sax_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH {_DAILY_SQL},
idx AS (
  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t, x
  FROM daily),
tot AS (
  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n, sum(x) AS s1,
         sum(x * x) AS s2
  FROM idx),
z AS (
  SELECT CAST((t - 1) * {_SAX_W} {intdiv} CAST(n AS BIGINT) AS INT) AS seg,
         n * x - s1 AS v, n * s2 - s1 * s1 AS m2
  FROM idx, tot),
seg AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS n_days_seg,
         sum(v) AS sv, max(m2) AS m2
  FROM z GROUP BY seg),
paa AS (
  SELECT seg, n_days_seg,
         CASE WHEN m2 <= 0 THEN 0.0
              ELSE CAST(floor(CAST(sv AS DOUBLE)
                     / CAST(n_days_seg AS DOUBLE)
                     / sqrt(CAST(m2 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
                   / 1e6 END AS paa
  FROM seg)
SELECT seg, n_days_seg, paa,
       CASE WHEN paa < -0.6745 THEN 'a'
            WHEN paa < 0.0 THEN 'b'
            WHEN paa < 0.6745 THEN 'c'
            ELSE 'd' END AS symbol
FROM paa
ORDER BY seg
"""


def q_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization of the daily series: exact z-scores
    zₜ = (n·xₜ−S)/√(n·Σx²−S²), piecewise-aggregate approximation over
    ``_SAX_W`` equal segments (integer division on the day index), and
    the 4-letter Gaussian alphabet a|b|c|d at breakpoints ±0.6745, 0
    applied to the micro-quantized PAA (so the letter boundary is
    bit-identical cross-engine).

    Scale: per-day partial agg → one ≤ #days window for the index →
    an 8-row segment aggregate.  At 100 TB the output is still 8 rows.
    """
    _q._register_views(spark, sf_dir, ["events"])
    return spark.sql(_sax_sql("spark"))


# ---------------------------------------------------------------------------
# randomized_response
# ---------------------------------------------------------------------------


def _rr_sql(dialect: str) -> str:
    st = _str_t(dialect)
    did = f"CAST(doc_id AS {st}) || ':{_RR_SEED}'"
    h_coin = f"({_hexd(did, 1)} * 16 + {_hexd(did, 2)})"
    h_repl = f"({_hexd(did, 3)} * 16 + {_hexd(did, 4)})"
    return f"""
WITH base AS (
  SELECT doc_id, coalesce(lang, '') AS lang FROM documents),
dim AS (
  SELECT lang, CAST(row_number() OVER (ORDER BY lang) AS INT) AS rk
  FROM (SELECT DISTINCT lang FROM base)),
kk AS (SELECT CAST(count(*) AS INT) AS k FROM dim),
rep AS (
  SELECT CASE WHEN {h_coin} < 192 THEN b.lang ELSE d.lang END AS rlang
  FROM base b
  JOIN kk ON 1 = 1
  JOIN dim d ON d.rk = ({h_repl} % kk.k) + 1),
rcnt AS (SELECT rlang, CAST(count(*) AS BIGINT) AS rep_cnt
         FROM rep GROUP BY rlang),
tcnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS true_cnt
         FROM base GROUP BY lang),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
est AS (
  SELECT t.lang, coalesce(r.rep_cnt, 0) AS rep_cnt, t.true_cnt,
         (CAST(coalesce(r.rep_cnt, 0) AS DOUBLE) / CAST(n AS DOUBLE)
          - 0.25 / CAST(k AS DOUBLE)) / 0.75 AS est_raw,
         CAST(t.true_cnt AS DOUBLE) / CAST(n AS DOUBLE) AS true_f,
         CAST(k AS DOUBLE) AS kd
  FROM tcnt t
  LEFT JOIN rcnt r ON r.rlang = t.lang
  CROSS JOIN tot CROSS JOIN kk)
SELECT lang, rep_cnt,
       CAST(floor(est_raw * 1e6 + 0.5) AS BIGINT) / 1e6 AS est_freq,
       CAST(floor(true_f * 1e6 + 0.5) AS BIGINT) / 1e6 AS true_freq,
       CAST(floor(abs(est_raw - true_f) * 1e6 + 0.5) AS BIGINT) / 1e6
         AS abs_err,
       CAST(floor(ln((0.75 + 0.25 / kd) / (0.25 / kd)) * 1e6 + 0.5)
         AS BIGINT) / 1e6 AS epsilon
FROM est
ORDER BY lang
"""


def q_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-DP randomized response over ``documents.lang``: each row
    reports its true label with p = 3/4 (hash coin: first md5 byte
    < 192) else the label whose dense rank is (second md5 byte mod k)
    — both coins from the portable md5-hex trick, so the mechanism is
    deterministic and bit-identical on both engines.  The de-biased
    estimator π̂ᵥ = (fᵥ − (1−p)/k)/p is reported against the true
    frequency with the realized |error| and the ε budget
    ln((p+(1−p)/k)/((1−p)/k)) the mechanism spends.

    Scale: one map-side hash projection, a k-row broadcast dim join
    (k = #labels), two k-row aggregates; nothing shuffles wider than
    the label domain.
    """
    _q._register_views(spark, sf_dir, ["documents"])
    return spark.sql(_rr_sql("spark"))


# ---------------------------------------------------------------------------
# f2_ams_sketch
# ---------------------------------------------------------------------------


def _f2_sql(dialect: str) -> str:
    if dialect == "spark":
        toks = (
            "SELECT tok FROM documents "
            "LATERAL VIEW explode(filter(split(coalesce(text, ''), ' '),"
            " x -> x <> '')) tk AS tok"
        )
        median = "element_at(array_sort(array({vals})), 3)"
    else:
        toks = (
            "SELECT unnest(list_filter(string_split(coalesce(text, ''), ' ')"
            ", x -> x <> '')) AS tok FROM documents"
        )
        median = "list_sort([{vals}])[3]"
    signs = ", ".join(
        f"sum(f * s{r}) AS z{r}" for r in range(1, _F2_R + 1)
    )
    sign_cols = ", ".join(
        "CAST(2 * ({h} % 2) - 1 AS DECIMAL(38,0)) AS s{r}".format(
            h=_hexd("tok || ':f2:{}'".format(r), 1), r=r
        )
        for r in range(1, _F2_R + 1)
    )
    med = median.format(
        vals=", ".join(
            f"CAST(z{r} * z{r} AS BIGINT)" for r in range(1, _F2_R + 1)
        )
    )
    return f"""
WITH toks AS ({toks}),
freq AS (
  SELECT tok, CAST(count(*) AS DECIMAL(38,0)) AS f
  FROM toks GROUP BY tok),
signed AS (
  SELECT f, {sign_cols} FROM freq),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_tokens_distinct,
         CAST(sum(f * f) AS BIGINT) AS exact_f2, {signs}
  FROM signed),
med AS (
  SELECT n_tokens_distinct, exact_f2, {med} AS f2_est FROM agg)
SELECT n_tokens_distinct, exact_f2, f2_est,
       CASE WHEN exact_f2 = 0 THEN 0.0
            ELSE CAST(floor(abs(CAST(f2_est AS DOUBLE)
                   - CAST(exact_f2 AS DOUBLE)) / CAST(exact_f2 AS DOUBLE)
                   * 1e6 + 0.5) AS BIGINT) / 1e6 END AS rel_err
FROM med
"""


def q_f2_ams_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS tug-of-war F₂ (self-join size) estimate of the token
    stream: ``_F2_R`` independent ±1 hash projections (sign = parity
    of the first md5 hex digit of tok:'f2':r), zᵣ = Σᵥ fᵥ·sᵣ(v),
    estimate = median(zᵣ²), reported next to the exact F₂ = Σ fᵥ² and
    the realized relative error — the error-contract surface the
    oracle pins, same doctrine as ``approx_distinct``.

    Scale: one partial-agg token count, then ONE 1-row reduce carrying
    all R signed sums and the exact F₂ simultaneously; sketch state is
    R numbers regardless of corpus size (estimating self-join size
    without ever joining is the reason AMS exists).
    """
    _q._register_views(spark, sf_dir, ["documents"])
    return spark.sql(_f2_sql("spark"))


DISTFIT_QUERIES = {
    "jarque_bera": q_jarque_bera,
    "dickey_fuller": q_dickey_fuller,
    "sax_symbols": q_sax_symbols,
    "randomized_response": q_randomized_response,
    "f2_ams_sketch": q_f2_ams_sketch,
}

DISTFIT_ORACLES = {
    "jarque_bera": _jarque_bera_sql("duck"),
    "dickey_fuller": _dickey_fuller_sql("duck"),
    "sax_symbols": _sax_sql("duck"),
    "randomized_response": _rr_sql("duck"),
    "f2_ams_sketch": _f2_sql("duck"),
}

_q.QUERIES.update(DISTFIT_QUERIES)
_q.ORACLES.update(DISTFIT_ORACLES)
