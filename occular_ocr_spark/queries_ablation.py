"""Source-ablation catalog, round 4 (wave 78): five leave-one-out
data-valuation operators over the documents corpus.  The shared
algebra: every "corpus without source s" statistic is derived from ONE
scan's group sums via the global-minus-group identity — never a
per-source rescan.  At 100 TB with S sources this is one shuffle to a
≤S-row (or ≤S×V-row) frame plus row-local arithmetic, versus the naive
S full passes.

* ``loo_source_moments`` — per source: corpus-excluding-source count,
  mean (half-up micro, exact BIGINT rational) and population variance
  (micro, exact DECIMAL(38,0) numerator N'·S2'−S1'², one IEEE DOUBLE
  ratio micro-quantized) of n_chars; signed mean shift vs the global
  mean as a difference of the two already-rounded micros.
* ``loo_median_shift`` — per source: the exact lower median of
  n_chars with the source removed, via the global value histogram
  minus the source's per-value counts (cumulative over the bounded
  #sources×#values frame), vs the global lower median.
* ``loo_quality_rate`` — per source: the quality-gate pass rate
  (n_chars in [{_QG_LO}, {_QG_HI}] and lang != '{_QG_XLANG}') of the
  corpus without the source, half-up micro, and its signed delta vs
  the global rate (rounded-then-subtracted).
* ``loo_lang_mix_l1`` — per source: the L1 distance between the
  global language mix and the mix with the source removed, in micro —
  how much one source's removal tilts the corpus language
  distribution.  Shares are half-up micro per language over the full
  source×lang grid (missing (source, lang) cells count 0).
* ``loo_block_pair_load`` — per source: the marginal candidate-pair
  load it contributes under (lang, n_chars DIV {_BLK_W}) blocking:
  Σ_b [C(n_b,2) − C(n_b−c_bs,2)] — which source drives the quadratic
  verify cost of a blocked dedup, plus its half-up micro share of the
  total pair load.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus a plan assertion in tests/test_ablation_wave.py.

Cross-engine float policy: exact BIGINT / DECIMAL(38,0) integers
end-to-end; the one cross-row ratio (LOO variance) is an IEEE DOUBLE
of two exact integers micro-quantized with floor(x·1e6+0.5) — the
durbin_watson doctrine.  Signed deltas are differences of two
independently half-up-rounded non-negative micros.

Scale notes: every operator is one partial-agg scan to a bounded
frame — ≤S source rows, ≤S×V (value-histogram grid), ≤S×L (lang
grid), or ≤#blocks rows — then row-local algebra.  Windows order only
those bounded frames; no corpus-sized window, no per-source rescan,
no driver loop.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_QG_LO = 100
_QG_HI = 400
_QG_XLANG = "zh"
_BLK_W = 50


# ---------------------------------------------------------------------------
# loo_source_moments
# ---------------------------------------------------------------------------


def q_loo_source_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOO count/mean/pop-variance of n_chars per source from one
    partial-agg scan: global sums via a window over the ≤S frame."""
    per = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_g"),
            F.sum("n_chars").cast("long").alias("s1_g"),
            F.sum(F.expr("n_chars * n_chars")).cast("long").alias("s2_g"),
        )
    )
    return (
        per.selectExpr(
            "source",
            "sum(n_g) OVER () - n_g AS n_excl",
            "sum(s1_g) OVER () - s1_g AS s1x",
            "sum(s2_g) OVER () - s2_g AS s2x",
            "sum(n_g) OVER () AS n_all",
            "sum(s1_g) OVER () AS s1_all",
        )
        .selectExpr(
            "source",
            "n_excl",
            "CAST((2000000 * s1x + n_excl) DIV (2 * n_excl) AS BIGINT)"
            " AS mean_excl_micro",
            "CAST(floor(CAST(CAST(n_excl AS DECIMAL(38,0)) * s2x"
            " - CAST(s1x AS DECIMAL(38,0)) * s1x AS DOUBLE)"
            " / CAST(CAST(n_excl AS DECIMAL(38,0)) * n_excl AS DOUBLE)"
            " * 1e6 + 0.5) AS BIGINT) AS var_excl_micro",
            "CAST((2000000 * s1_all + n_all) DIV (2 * n_all) AS BIGINT)"
            " AS mean_global_micro",
        )
        .selectExpr(
            "source",
            "n_excl",
            "mean_excl_micro",
            "var_excl_micro",
            "mean_global_micro",
            "mean_excl_micro - mean_global_micro AS mean_shift_micro",
        )
    )


ORACLE_LOO_SOURCE_MOMENTS = """
WITH per AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(n_chars) AS BIGINT) AS s1_g,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS s2_g
  FROM documents GROUP BY source),
loo AS (
  SELECT source,
         sum(n_g) OVER () - n_g AS n_excl,
         sum(s1_g) OVER () - s1_g AS s1x,
         sum(s2_g) OVER () - s2_g AS s2x,
         sum(n_g) OVER () AS n_all,
         sum(s1_g) OVER () AS s1_all
  FROM per),
sc AS (
  SELECT source, n_excl,
         CAST((2000000 * s1x + n_excl) // (2 * n_excl) AS BIGINT)
           AS mean_excl_micro,
         CAST(floor(CAST(CAST(n_excl AS DECIMAL(38,0)) * s2x
              - CAST(s1x AS DECIMAL(38,0)) * s1x AS DOUBLE)
              / CAST(CAST(n_excl AS DECIMAL(38,0)) * n_excl AS DOUBLE)
              * 1e6 + 0.5) AS BIGINT) AS var_excl_micro,
         CAST((2000000 * s1_all + n_all) // (2 * n_all) AS BIGINT)
           AS mean_global_micro
  FROM loo)
SELECT source, n_excl, mean_excl_micro, var_excl_micro,
       mean_global_micro,
       mean_excl_micro - mean_global_micro AS mean_shift_micro
FROM sc
"""


# ---------------------------------------------------------------------------
# loo_median_shift
# ---------------------------------------------------------------------------


def q_loo_median_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact LOO lower median per source from the global n_chars value
    histogram minus the source's per-value counts."""
    d = _t(spark, sf_dir, "documents")
    hist = d.groupBy("n_chars").agg(F.count("*").cast("long").alias("cnt"))
    shist = (
        d.groupBy("source", "n_chars")
        .agg(F.count("*").cast("long").alias("scnt"))
    )
    srcs = d.groupBy("source").agg(F.count("*").cast("long").alias("n_g"))
    grid = (
        srcs.crossJoin(F.broadcast(hist))
        .join(shist, ["source", "n_chars"], "left")
        .selectExpr(
            "source", "n_g", "n_chars", "cnt - coalesce(scnt, 0L) AS xcnt"
        )
    )
    cum = grid.selectExpr(
        "source",
        "n_g",
        "n_chars",
        "sum(xcnt) OVER (PARTITION BY source ORDER BY n_chars"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum",
        "sum(xcnt) OVER (PARTITION BY source) AS n_excl",
    )
    loo = (
        cum.where("cum >= (n_excl + 1) DIV 2")
        .groupBy("source")
        .agg(
            F.min("n_chars").cast("long").alias("loo_median"),
            F.max("n_excl").cast("long").alias("n_excl"),
        )
    )
    gmed = (
        hist.selectExpr(
            "n_chars",
            "sum(cnt) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED"
            " PRECEDING AND CURRENT ROW) AS cum",
            "sum(cnt) OVER () AS n_all",
        )
        .where("cum >= (n_all + 1) DIV 2")
        .agg(F.min("n_chars").cast("long").alias("global_median"))
    )
    return loo.crossJoin(F.broadcast(gmed)).selectExpr(
        "source",
        "n_excl",
        "loo_median",
        "global_median",
        "loo_median - global_median AS median_shift",
    )


ORACLE_LOO_MEDIAN_SHIFT = """
WITH hist AS (
  SELECT n_chars, CAST(count(*) AS BIGINT) AS cnt
  FROM documents GROUP BY n_chars),
shist AS (
  SELECT source, n_chars, CAST(count(*) AS BIGINT) AS scnt
  FROM documents GROUP BY source, n_chars),
srcs AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_g
  FROM documents GROUP BY source),
grid AS (
  SELECT s.source, s.n_g, h.n_chars,
         h.cnt - coalesce(sh.scnt, 0) AS xcnt
  FROM srcs s CROSS JOIN hist h
  LEFT JOIN shist sh ON sh.source = s.source AND sh.n_chars = h.n_chars),
cum AS (
  SELECT source, n_chars,
         sum(xcnt) OVER (PARTITION BY source ORDER BY n_chars
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(xcnt) OVER (PARTITION BY source) AS n_excl
  FROM grid),
loo AS (
  SELECT source,
         CAST(min(n_chars) AS BIGINT) AS loo_median,
         CAST(max(n_excl) AS BIGINT) AS n_excl
  FROM cum WHERE cum >= (n_excl + 1) // 2 GROUP BY source),
gcum AS (
  SELECT n_chars,
         sum(cnt) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED
           PRECEDING AND CURRENT ROW) AS cum,
         sum(cnt) OVER () AS n_all
  FROM hist),
gmed AS (
  SELECT CAST(min(n_chars) AS BIGINT) AS global_median
  FROM gcum WHERE cum >= (n_all + 1) // 2)
SELECT l.source, l.n_excl, l.loo_median, g.global_median,
       l.loo_median - g.global_median AS median_shift
FROM loo l CROSS JOIN gmed g
"""


# ---------------------------------------------------------------------------
# loo_quality_rate
# ---------------------------------------------------------------------------


def q_loo_quality_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOO quality-gate pass rate per source; signed delta vs the
    global rate as a difference of half-up micros."""
    per = (
        _t(spark, sf_dir, "documents")
        .selectExpr(
            "source",
            f"CASE WHEN n_chars BETWEEN {_QG_LO} AND {_QG_HI}"
            f" AND lang <> '{_QG_XLANG}' THEN 1L ELSE 0L END AS ok",
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_g"),
            F.sum("ok").cast("long").alias("p_g"),
        )
    )
    return (
        per.selectExpr(
            "source",
            "sum(n_g) OVER () - n_g AS n_excl",
            "sum(p_g) OVER () - p_g AS pass_excl",
            "sum(n_g) OVER () AS n_all",
            "sum(p_g) OVER () AS p_all",
        )
        .selectExpr(
            "source",
            "n_excl",
            "pass_excl",
            "CAST((2000000 * pass_excl + n_excl) DIV (2 * n_excl)"
            " AS BIGINT) AS rate_excl_micro",
            "CAST((2000000 * p_all + n_all) DIV (2 * n_all) AS BIGINT)"
            " AS rate_global_micro",
        )
        .selectExpr(
            "source",
            "n_excl",
            "pass_excl",
            "rate_excl_micro",
            "rate_global_micro",
            "rate_excl_micro - rate_global_micro AS rate_delta_micro",
        )
    )


ORACLE_LOO_QUALITY_RATE = f"""
WITH per AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(CASE WHEN n_chars BETWEEN {_QG_LO} AND {_QG_HI}
                       AND lang <> '{_QG_XLANG}' THEN 1 ELSE 0 END)
              AS BIGINT) AS p_g
  FROM documents GROUP BY source),
loo AS (
  SELECT source,
         sum(n_g) OVER () - n_g AS n_excl,
         sum(p_g) OVER () - p_g AS pass_excl,
         sum(n_g) OVER () AS n_all,
         sum(p_g) OVER () AS p_all
  FROM per),
sc AS (
  SELECT source, n_excl, pass_excl,
         CAST((2000000 * pass_excl + n_excl) // (2 * n_excl) AS BIGINT)
           AS rate_excl_micro,
         CAST((2000000 * p_all + n_all) // (2 * n_all) AS BIGINT)
           AS rate_global_micro
  FROM loo)
SELECT source, n_excl, pass_excl, rate_excl_micro, rate_global_micro,
       rate_excl_micro - rate_global_micro AS rate_delta_micro
FROM sc
"""


# ---------------------------------------------------------------------------
# loo_lang_mix_l1
# ---------------------------------------------------------------------------


def q_loo_lang_mix_l1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 drift of the corpus language mix when each source is
    removed: per-language half-up micro shares over the full
    source×lang grid, |excl − global| summed per source."""
    d = _t(spark, sf_dir, "documents")
    sl = (
        d.groupBy("source", "lang")
        .agg(F.count("*").cast("long").alias("c"))
    )
    lt = d.groupBy("lang").agg(F.count("*").cast("long").alias("l_all"))
    st = d.groupBy("source").agg(F.count("*").cast("long").alias("n_g"))
    tot = d.agg(F.count("*").cast("long").alias("n_all"))
    grid = (
        st.crossJoin(F.broadcast(lt))
        .join(sl, ["source", "lang"], "left")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "source",
            "lang",
            "n_all - n_g AS n_excl",
            "l_all - coalesce(c, 0L) AS l_excl",
            "l_all",
            "n_all",
        )
    )
    per_lang = grid.selectExpr(
        "source",
        "n_excl",
        "CAST((2000000 * l_excl + n_excl) DIV (2 * n_excl) AS BIGINT)"
        " AS e_micro",
        "CAST((2000000 * l_all + n_all) DIV (2 * n_all) AS BIGINT)"
        " AS g_micro",
    )
    return per_lang.groupBy("source").agg(
        F.max("n_excl").cast("long").alias("n_excl"),
        F.count("*").cast("long").alias("n_langs"),
        F.sum(F.expr("abs(e_micro - g_micro)")).cast("long").alias("l1_micro"),
    )


ORACLE_LOO_LANG_MIX_L1 = """
WITH sl AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY source, lang),
lt AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS l_all
  FROM documents GROUP BY lang),
st AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_g
  FROM documents GROUP BY source),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM documents),
grid AS (
  SELECT s.source, l.lang,
         t.n_all - s.n_g AS n_excl,
         l.l_all - coalesce(x.c, 0) AS l_excl,
         l.l_all, t.n_all
  FROM st s CROSS JOIN lt l
  LEFT JOIN sl x ON x.source = s.source AND x.lang = l.lang
  CROSS JOIN tot t),
per_lang AS (
  SELECT source, n_excl,
         CAST((2000000 * l_excl + n_excl) // (2 * n_excl) AS BIGINT)
           AS e_micro,
         CAST((2000000 * l_all + n_all) // (2 * n_all) AS BIGINT)
           AS g_micro
  FROM grid)
SELECT source,
       CAST(max(n_excl) AS BIGINT) AS n_excl,
       CAST(count(*) AS BIGINT) AS n_langs,
       CAST(sum(abs(e_micro - g_micro)) AS BIGINT) AS l1_micro
FROM per_lang GROUP BY source
"""


# ---------------------------------------------------------------------------
# loo_block_pair_load
# ---------------------------------------------------------------------------


def q_loo_block_pair_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal candidate-pair load per source under
    (lang, n_chars DIV W) blocking: Σ_b C(n_b,2) − C(n_b−c_bs,2),
    plus the half-up micro share of the total pair load."""
    d = _t(spark, sf_dir, "documents").selectExpr(
        "source", "lang", f"n_chars DIV {_BLK_W} AS bkt"
    )
    blocks = (
        d.groupBy("lang", "bkt").agg(F.count("*").cast("long").alias("n_b"))
    )
    sblocks = (
        d.groupBy("source", "lang", "bkt")
        .agg(F.count("*").cast("long").alias("c"))
    )
    tot = blocks.agg(
        F.sum(F.expr("n_b * (n_b - 1) DIV 2")).cast("long").alias("total_pairs")
    )
    marg = (
        sblocks.join(blocks, ["lang", "bkt"])
        .selectExpr(
            "source",
            "n_b * (n_b - 1) DIV 2"
            " - (n_b - c) * (n_b - c - 1) DIV 2 AS dp",
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("blocks_touched"),
            F.sum("dp").cast("long").alias("marginal_pairs"),
        )
    )
    return marg.crossJoin(F.broadcast(tot)).selectExpr(
        "source",
        "blocks_touched",
        "marginal_pairs",
        "total_pairs",
        "CASE WHEN total_pairs > 0 THEN CAST((2000000 * marginal_pairs"
        " + total_pairs) DIV (2 * total_pairs) AS BIGINT)"
        " ELSE 0L END AS load_share_micro",
    )


ORACLE_LOO_BLOCK_PAIR_LOAD = f"""
WITH d AS (
  SELECT source, lang, n_chars // {_BLK_W} AS bkt FROM documents),
blocks AS (
  SELECT lang, bkt, CAST(count(*) AS BIGINT) AS n_b
  FROM d GROUP BY lang, bkt),
sblocks AS (
  SELECT source, lang, bkt, CAST(count(*) AS BIGINT) AS c
  FROM d GROUP BY source, lang, bkt),
tot AS (
  SELECT CAST(sum(n_b * (n_b - 1) // 2) AS BIGINT) AS total_pairs
  FROM blocks),
marg AS (
  SELECT s.source,
         CAST(count(*) AS BIGINT) AS blocks_touched,
         CAST(sum(b.n_b * (b.n_b - 1) // 2
              - (b.n_b - s.c) * (b.n_b - s.c - 1) // 2) AS BIGINT)
           AS marginal_pairs
  FROM sblocks s JOIN blocks b ON b.lang = s.lang AND b.bkt = s.bkt
  GROUP BY s.source)
SELECT m.source, m.blocks_touched, m.marginal_pairs, t.total_pairs,
       CASE WHEN t.total_pairs > 0 THEN
         CAST((2000000 * m.marginal_pairs + t.total_pairs)
              // (2 * t.total_pairs) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS load_share_micro
FROM marg m CROSS JOIN tot t
"""


ABLATION_QUERIES = {
    "loo_source_moments": q_loo_source_moments,
    "loo_median_shift": q_loo_median_shift,
    "loo_quality_rate": q_loo_quality_rate,
    "loo_lang_mix_l1": q_loo_lang_mix_l1,
    "loo_block_pair_load": q_loo_block_pair_load,
}

ABLATION_ORACLES = {
    "loo_source_moments": ORACLE_LOO_SOURCE_MOMENTS,
    "loo_median_shift": ORACLE_LOO_MEDIAN_SHIFT,
    "loo_quality_rate": ORACLE_LOO_QUALITY_RATE,
    "loo_lang_mix_l1": ORACLE_LOO_LANG_MIX_L1,
    "loo_block_pair_load": ORACLE_LOO_BLOCK_PAIR_LOAD,
}

_q.QUERIES.update(ABLATION_QUERIES)
_q.ORACLES.update(ABLATION_ORACLES)
