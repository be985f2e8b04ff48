"""Causal-evaluation catalog, round 4 (wave 87): five operators from
the uplift/observational-causal toolbox, run as a PLACEBO pipeline —
the "treatment" is a deterministic portable-hash coin on doc_id, so
every effect estimate has a known ground truth (≈0) and the
machinery (balance checks, matching, permutation inference) is what
is being certified.  Units = documents; outcome y = (lang = 'en');
score/covariate = n_chars (plus the whitespace token count for the
balance table).

* ``qini_curve`` — the uplift evaluation curve: score deciles from
  the n_chars value histogram (ceil-rank decile map — bounded, never
  a corpus window), cumulative treated/control counts and
  conversions in descending-score order, and the exact-rational Qini
  value cumT − cumC·(nT/nC) as a sign-split half-up micro.
* ``covariate_balance_smd`` — the standardized-mean-difference
  balance table per covariate: SMD = (μt−μc)/√((σt²+σc²)/2) from
  exact moment integers, one row-local IEEE sqrt, sign-split micro —
  |SMD| ≲ 0.1 is the covariate-balance convention being audited.
* ``att_nearest_match`` — value-level 1-NN matching: each distinct
  treated n_chars value matches the nearest control value
  (tie → smaller), per-value mean-outcome difference as an exact
  rational micro — the matched-ATT ingredient table, all on the
  bounded distinct-value frame.
* ``placebo_permutation_test`` — the observed effect (salt 0) plus
  {_PERM_K} placebo re-labelings (salts 1..{_PERM_K}) computed in ONE
  scan (per-row salt array explode → per-salt partial aggs): each
  salt's treated/control conversion-rate difference micro and the
  |effect| ≥ |observed| flag the permutation p-value counts.
* ``ipf_raking_2iter`` — two unrolled iterations of iterative
  proportional fitting on the source×lang count grid toward uniform
  row/col margins: cell weights in micro (half-up quantized between
  iterations so both engines round identically), with the raked cell
  mass.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_causal_wave.py.

Cross-engine float policy: exact BIGINT / DECIMAL(38,0)-vs-HUGEINT
half-up micro rationals; the one float (SMD sqrt) is IEEE sqrt on an
exact integer radicand in a fixed operation order, micro-quantized.

Scale notes: one documents scan to per-(value|cell|salt) partial
aggs; every window orders bounded frames (value histogram, 10-row
decile grid, ≤S×L raking grid, {_PERM_K}+1 salt rows); the
nearest-match join is distinct-value × distinct-value (domain-
bounded, not corpus-bounded); the salt fan-out is map-side.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_PERM_K = 20


def _coin(salt: str, dialect: str) -> str:
    """Portable 1-bit hash of doc_id with a salt tag (the
    ``sample_stratified`` hex-alphabet idiom)."""
    strtype = "STRING" if dialect == "spark" else "VARCHAR"

    def hexv(j: int) -> str:
        return (
            f"(instr('0123456789abcdef', substr(md5("
            f"CAST(doc_id AS {strtype}) || ':{salt}'"
            f"), {j}, 1)) - 1)"
        )

    return (
        f"(((({hexv(1)} * 16 + {hexv(2)}) * 16 + {hexv(3)})"
        f" * 16 + {hexv(4)}) % 2)"
    )


def _units(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "CAST(n_chars AS BIGINT) AS v",
        "CASE WHEN lang = 'en' THEN 1L ELSE 0L END AS y",
        f"CAST({_coin('t0', 'spark')} AS BIGINT) AS t",
    )


_UNITS_SQL_D = f"""
units AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS v,
         CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y,
         CAST({_coin('t0', 'duck')} AS BIGINT) AS t
  FROM documents)
"""


# ---------------------------------------------------------------------------
# qini_curve
# ---------------------------------------------------------------------------


def q_qini_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative uplift by descending-score decile; Qini as the
    exact rational cumT − cumC·(nT/nC) in sign-split micro."""
    u = _q._persist_tracked(_units(spark, sf_dir))
    hist = u.groupBy("v").agg(F.count("*").cast("long").alias("m"))
    dec = hist.selectExpr(
        "v",
        # descending-score deciles: rank from the top
        "CAST(((sum(m) OVER (ORDER BY v DESC ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) - 1) * 10)"
        " DIV (sum(m) OVER ()) + 1 AS BIGINT) AS decile",
    )
    per = (
        u.join(F.broadcast(dec), "v")
        .groupBy("decile")
        .agg(
            F.sum(F.expr("CASE WHEN t = 1 THEN 1L ELSE 0L END"))
            .cast("long")
            .alias("n_t"),
            F.sum(F.expr("CASE WHEN t = 1 THEN y ELSE 0L END"))
            .cast("long")
            .alias("c_t"),
            F.sum(F.expr("CASE WHEN t = 0 THEN 1L ELSE 0L END"))
            .cast("long")
            .alias("n_c"),
            F.sum(F.expr("CASE WHEN t = 0 THEN y ELSE 0L END"))
            .cast("long")
            .alias("c_c"),
        )
    )
    cum = per.selectExpr(
        "decile",
        "sum(n_t) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) AS cum_nt",
        "sum(c_t) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) AS cum_ct",
        "sum(n_c) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) AS cum_nc",
        "sum(c_c) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) AS cum_cc",
    )
    return cum.where("cum_nc > 0").selectExpr(
        "decile",
        "CAST(cum_nt AS BIGINT) AS cum_nt",
        "CAST(cum_ct AS BIGINT) AS cum_ct",
        "CAST(cum_nc AS BIGINT) AS cum_nc",
        "CAST(cum_cc AS BIGINT) AS cum_cc",
        "CASE WHEN cum_ct * cum_nc - cum_cc * cum_nt >= 0 THEN"
        " CAST((2000000 * (cum_ct * cum_nc - cum_cc * cum_nt)"
        " + cum_nc) DIV (2 * cum_nc) AS BIGINT)"
        " ELSE -CAST((2000000 * (cum_cc * cum_nt - cum_ct * cum_nc)"
        " + cum_nc) DIV (2 * cum_nc) AS BIGINT) END AS qini_micro",
    )


ORACLE_QINI_CURVE = f"""
WITH {_UNITS_SQL_D},
hist AS (SELECT v, CAST(count(*) AS BIGINT) AS m FROM units
         GROUP BY v),
dec AS (
  SELECT v,
         CAST(((sum(m) OVER (ORDER BY v DESC ROWS BETWEEN UNBOUNDED
           PRECEDING AND CURRENT ROW) - 1) * 10)
           // (sum(m) OVER ()) + 1 AS BIGINT) AS decile
  FROM hist),
per AS (
  SELECT d.decile,
         CAST(sum(CASE WHEN u.t = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_t,
         CAST(sum(CASE WHEN u.t = 1 THEN u.y ELSE 0 END) AS BIGINT)
           AS c_t,
         CAST(sum(CASE WHEN u.t = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_c,
         CAST(sum(CASE WHEN u.t = 0 THEN u.y ELSE 0 END) AS BIGINT)
           AS c_c
  FROM units u JOIN dec d ON d.v = u.v
  GROUP BY d.decile),
cum AS (
  SELECT decile,
         sum(n_t) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
           PRECEDING AND CURRENT ROW) AS cum_nt,
         sum(c_t) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
           PRECEDING AND CURRENT ROW) AS cum_ct,
         sum(n_c) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
           PRECEDING AND CURRENT ROW) AS cum_nc,
         sum(c_c) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
           PRECEDING AND CURRENT ROW) AS cum_cc
  FROM per)
SELECT decile,
       CAST(cum_nt AS BIGINT) AS cum_nt,
       CAST(cum_ct AS BIGINT) AS cum_ct,
       CAST(cum_nc AS BIGINT) AS cum_nc,
       CAST(cum_cc AS BIGINT) AS cum_cc,
       CASE WHEN cum_ct * cum_nc - cum_cc * cum_nt >= 0 THEN
         CAST((2000000 * (cum_ct * cum_nc - cum_cc * cum_nt)
              + cum_nc) // (2 * cum_nc) AS BIGINT)
       ELSE -CAST((2000000 * (cum_cc * cum_nt - cum_ct * cum_nc)
              + cum_nc) // (2 * cum_nc) AS BIGINT) END AS qini_micro
FROM cum WHERE cum_nc > 0
"""


# ---------------------------------------------------------------------------
# covariate_balance_smd
# ---------------------------------------------------------------------------

_TOK = "CAST(size(split(coalesce(text, ''), ' +')) AS BIGINT)"
_TOK_D = (
    "CAST(len(string_split_regex(coalesce(text, ''), ' +')) AS BIGINT)"
)


def q_covariate_balance_smd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMD per covariate between the hash-treatment arms, from exact
    moment sums; |SMD| near 0 certifies the placebo balance."""
    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "CAST(n_chars AS BIGINT) AS x_chars",
        f"{_TOK} AS x_tokens",
        f"CAST({_coin('t0', 'spark')} AS BIGINT) AS t",
    )
    cov = d.selectExpr(
        "t", "stack(2, 'n_chars', x_chars, 'tokens', x_tokens)"
        " AS (covariate, x)"
    )
    mom = cov.groupBy("covariate", "t").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.expr("x * x")).cast("long").alias("s2"),
    )
    piv = mom.groupBy("covariate").agg(
        F.max(F.expr("CASE WHEN t = 1 THEN n END")).cast("long").alias("n_t"),
        F.max(F.expr("CASE WHEN t = 1 THEN s1 END")).cast("long").alias("s1t"),
        F.max(F.expr("CASE WHEN t = 1 THEN s2 END")).cast("long").alias("s2t"),
        F.max(F.expr("CASE WHEN t = 0 THEN n END")).cast("long").alias("n_c"),
        F.max(F.expr("CASE WHEN t = 0 THEN s1 END")).cast("long").alias("s1c"),
        F.max(F.expr("CASE WHEN t = 0 THEN s2 END")).cast("long").alias("s2c"),
    )
    # SMD = (s1t/nt - s1c/nc) / sqrt(((nt*s2t-s1t^2)/nt^2
    #        + (nc*s2c-s1c^2)/nc^2)/2), fixed op order
    smd = (
        "(CAST(s1t AS DOUBLE) / CAST(n_t AS DOUBLE)"
        " - CAST(s1c AS DOUBLE) / CAST(n_c AS DOUBLE))"
        " / sqrt((CAST(n_t * s2t - s1t * s1t AS DOUBLE)"
        " / CAST(n_t * n_t AS DOUBLE)"
        " + CAST(n_c * s2c - s1c * s1c AS DOUBLE)"
        " / CAST(n_c * n_c AS DOUBLE)) / 2.0)"
    )
    return piv.selectExpr(
        "covariate",
        "n_t",
        "n_c",
        "CAST((2000000 * s1t + n_t) DIV (2 * n_t) AS BIGINT)"
        " AS mean_t_micro",
        "CAST((2000000 * s1c + n_c) DIV (2 * n_c) AS BIGINT)"
        " AS mean_c_micro",
        f"CASE WHEN {smd} >= 0 THEN CAST(floor({smd} * 1e6 + 0.5)"
        f" AS BIGINT) ELSE -CAST(floor(-({smd}) * 1e6 + 0.5)"
        " AS BIGINT) END AS smd_micro",
    )


ORACLE_COVARIATE_BALANCE_SMD = f"""
WITH d AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS x_chars,
         {_TOK_D} AS x_tokens,
         CAST({_coin('t0', 'duck')} AS BIGINT) AS t
  FROM documents),
cov AS (
  SELECT t, 'n_chars' AS covariate, x_chars AS x FROM d
  UNION ALL
  SELECT t, 'tokens' AS covariate, x_tokens AS x FROM d),
mom AS (
  SELECT covariate, t, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS s1,
         CAST(sum(x * x) AS BIGINT) AS s2
  FROM cov GROUP BY covariate, t),
piv AS (
  SELECT covariate,
         CAST(max(CASE WHEN t = 1 THEN n END) AS BIGINT) AS n_t,
         CAST(max(CASE WHEN t = 1 THEN s1 END) AS BIGINT) AS s1t,
         CAST(max(CASE WHEN t = 1 THEN s2 END) AS BIGINT) AS s2t,
         CAST(max(CASE WHEN t = 0 THEN n END) AS BIGINT) AS n_c,
         CAST(max(CASE WHEN t = 0 THEN s1 END) AS BIGINT) AS s1c,
         CAST(max(CASE WHEN t = 0 THEN s2 END) AS BIGINT) AS s2c
  FROM mom GROUP BY covariate)
SELECT covariate, n_t, n_c,
       CAST((2000000 * s1t + n_t) // (2 * n_t) AS BIGINT)
         AS mean_t_micro,
       CAST((2000000 * s1c + n_c) // (2 * n_c) AS BIGINT)
         AS mean_c_micro,
       CASE WHEN (CAST(s1t AS DOUBLE) / CAST(n_t AS DOUBLE)
         - CAST(s1c AS DOUBLE) / CAST(n_c AS DOUBLE))
         / sqrt((CAST(n_t * s2t - s1t * s1t AS DOUBLE)
         / CAST(n_t * n_t AS DOUBLE)
         + CAST(n_c * s2c - s1c * s1c AS DOUBLE)
         / CAST(n_c * n_c AS DOUBLE)) / 2.0) >= 0 THEN
         CAST(floor((CAST(s1t AS DOUBLE) / CAST(n_t AS DOUBLE)
           - CAST(s1c AS DOUBLE) / CAST(n_c AS DOUBLE))
           / sqrt((CAST(n_t * s2t - s1t * s1t AS DOUBLE)
           / CAST(n_t * n_t AS DOUBLE)
           + CAST(n_c * s2c - s1c * s1c AS DOUBLE)
           / CAST(n_c * n_c AS DOUBLE)) / 2.0) * 1e6 + 0.5)
           AS BIGINT)
       ELSE -CAST(floor(-((CAST(s1t AS DOUBLE) / CAST(n_t AS DOUBLE)
           - CAST(s1c AS DOUBLE) / CAST(n_c AS DOUBLE))
           / sqrt((CAST(n_t * s2t - s1t * s1t AS DOUBLE)
           / CAST(n_t * n_t AS DOUBLE)
           + CAST(n_c * s2c - s1c * s1c AS DOUBLE)
           / CAST(n_c * n_c AS DOUBLE)) / 2.0)) * 1e6 + 0.5)
           AS BIGINT) END AS smd_micro
FROM piv
"""


# ---------------------------------------------------------------------------
# att_nearest_match
# ---------------------------------------------------------------------------


def q_att_nearest_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-level 1-NN matching table: per treated n_chars value,
    the nearest control value and the exact-rational mean-outcome
    difference micro."""
    u = _q._persist_tracked(_units(spark, sf_dir))
    tv = u.where("t = 1").groupBy("v").agg(
        F.count("*").cast("long").alias("nt"),
        F.sum("y").cast("long").alias("ct"),
    )
    cv = u.where("t = 0").groupBy("v").agg(
        F.count("*").cast("long").alias("nc"),
        F.sum("y").cast("long").alias("cc"),
    )
    best = (
        tv.crossJoin(
            F.broadcast(
                cv.selectExpr("v AS vc", "nc", "cc")
            )
        )
        .selectExpr(
            "v",
            "nt",
            "ct",
            "abs(v - vc) AS dist",
            "vc",
            "nc",
            "cc",
        )
        .groupBy("v", "nt", "ct")
        .agg(
            F.expr("min(struct(dist, vc, nc, cc))").alias("b")
        )
        .selectExpr(
            "v",
            "nt",
            "ct",
            "b.vc AS matched_v",
            "b.dist AS match_dist",
            "b.nc AS nc",
            "b.cc AS cc",
        )
    )
    return best.selectExpr(
        "v",
        "nt",
        "ct",
        "matched_v",
        "match_dist",
        "nc",
        "cc",
        "CASE WHEN ct * nc - cc * nt >= 0 THEN"
        " CAST((2000000 * (ct * nc - cc * nt) + nt * nc)"
        " DIV (2 * nt * nc) AS BIGINT)"
        " ELSE -CAST((2000000 * (cc * nt - ct * nc) + nt * nc)"
        " DIV (2 * nt * nc) AS BIGINT) END AS delta_micro",
    )


ORACLE_ATT_NEAREST_MATCH = f"""
WITH {_UNITS_SQL_D},
tv AS (
  SELECT v, CAST(count(*) AS BIGINT) AS nt,
         CAST(sum(y) AS BIGINT) AS ct
  FROM units WHERE t = 1 GROUP BY v),
cv AS (
  SELECT v AS vc, CAST(count(*) AS BIGINT) AS nc,
         CAST(sum(y) AS BIGINT) AS cc
  FROM units WHERE t = 0 GROUP BY v),
best AS (
  SELECT v, nt, ct,
         min(struct_pack(dist := abs(v - vc), vc := vc, nc := nc,
                         cc := cc)) AS b
  FROM tv CROSS JOIN cv
  GROUP BY v, nt, ct)
SELECT v, nt, ct,
       b.vc AS matched_v,
       b.dist AS match_dist,
       b.nc AS nc,
       b.cc AS cc,
       CASE WHEN ct * b.nc - b.cc * nt >= 0 THEN
         CAST((2000000 * (ct * b.nc - b.cc * nt) + nt * b.nc)
              // (2 * nt * b.nc) AS BIGINT)
       ELSE -CAST((2000000 * (b.cc * nt - ct * b.nc) + nt * b.nc)
              // (2 * nt * b.nc) AS BIGINT) END AS delta_micro
FROM best
"""


# ---------------------------------------------------------------------------
# placebo_permutation_test
# ---------------------------------------------------------------------------


def _perm_sql(dialect: str) -> str:
    coins = ", ".join(
        f"({_coin(f't{k}', dialect)})" for k in range(_PERM_K + 1)
    )
    if dialect == "spark":
        expl = (
            f"LATERAL VIEW posexplode(array({coins})) x AS salt, t"
        )
        frame = f"""
per AS (
  SELECT CAST(salt AS BIGINT) AS salt,
         CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_t,
         CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT)
           AS c_t,
         CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_c,
         CAST(sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT)
           AS c_c
  FROM (SELECT doc_id,
          CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)
            AS y
        FROM documents) d
  {expl}
  GROUP BY salt)"""
        intdiv = "DIV"
    else:
        frame = f"""
per AS (
  SELECT CAST(x.salt AS BIGINT) AS salt,
         CAST(sum(CASE WHEN x.t = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_t,
         CAST(sum(CASE WHEN x.t = 1 THEN d.y ELSE 0 END) AS BIGINT)
           AS c_t,
         CAST(sum(CASE WHEN x.t = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_c,
         CAST(sum(CASE WHEN x.t = 0 THEN d.y ELSE 0 END) AS BIGINT)
           AS c_c
  FROM (SELECT doc_id,
          CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)
            AS y
        FROM documents) d,
       LATERAL (
         SELECT unnest(generate_series(0, {_PERM_K})) AS salt,
                unnest([{coins}]) AS t) x
  GROUP BY x.salt)"""
        intdiv = "//"
    eff = (
        "CASE WHEN c_t * n_c - c_c * n_t >= 0 THEN"
        f" CAST((2000000 * (c_t * n_c - c_c * n_t) + n_t * n_c)"
        f" {intdiv} (2 * n_t * n_c) AS BIGINT)"
        f" ELSE -CAST((2000000 * (c_c * n_t - c_t * n_c) + n_t * n_c)"
        f" {intdiv} (2 * n_t * n_c) AS BIGINT) END"
    )
    return f"""
WITH {frame},
sc AS (
  SELECT salt, n_t, c_t, n_c, c_c, {eff} AS effect_micro
  FROM per)
SELECT s.salt, s.n_t, s.c_t, s.n_c, s.c_c, s.effect_micro,
       CAST(CASE WHEN abs(s.effect_micro) >= abs(o.effect_micro)
            THEN 1 ELSE 0 END AS BIGINT) AS abs_ge_observed
FROM sc s CROSS JOIN (SELECT effect_micro FROM sc WHERE salt = 0) o
"""


def q_placebo_permutation_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Observed + K placebo treatment effects in one scan; the
    abs_ge_observed flags are the permutation p-value numerator."""
    _q._register_views(spark, sf_dir, ["documents"])
    return spark.sql(_perm_sql("spark"))


ORACLE_PLACEBO_PERMUTATION_TEST = _perm_sql("duck")


# ---------------------------------------------------------------------------
# ipf_raking_2iter
# ---------------------------------------------------------------------------


def _ipf_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    wide = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    # w1 = halfup(w0 * N * 1e6, nsrc * rowsum0)   (row step)
    # w2 = halfup(w1 * N * 1e6, nlang * colsum1)  (col step)
    return f"""
WITH grid AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY source, lang),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(count(DISTINCT source) AS BIGINT) AS nsrc,
         CAST(count(DISTINCT lang) AS BIGINT) AS nlang
  FROM grid),
w0 AS (
  SELECT g.source, g.lang, g.c, t.n, t.nsrc, t.nlang,
         CAST(1000000 AS BIGINT) AS w
  FROM grid g CROSS JOIN tot t),
r1 AS (
  SELECT source, lang, c, n, nsrc, nlang,
         CAST((2 * (CAST(w AS {wide}) * n * 1000000)
              + nsrc * sum(c * w) OVER (PARTITION BY source))
              {intdiv} (2 * nsrc * sum(c * w) OVER (PARTITION BY
              source)) AS BIGINT) AS w
  FROM w0),
r2 AS (
  SELECT source, lang, c, n, nsrc, nlang,
         CAST((2 * (CAST(w AS {wide}) * n * 1000000)
              + nlang * sum(c * w) OVER (PARTITION BY lang))
              {intdiv} (2 * nlang * sum(c * w) OVER (PARTITION BY
              lang)) AS BIGINT) AS w
  FROM r1)
SELECT source, lang, c, w AS weight_micro,
       CAST(c * w AS BIGINT) AS raked_mass_micro
FROM r2
"""


def q_ipf_raking_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled IPF iterations toward uniform source/lang
    margins, half-up micro weights at each stage."""
    _q._register_views(spark, sf_dir, ["documents"])
    return spark.sql(_ipf_sql("spark"))


ORACLE_IPF_RAKING_2ITER = _ipf_sql("duck")


CAUSAL_QUERIES = {
    "qini_curve": q_qini_curve,
    "covariate_balance_smd": q_covariate_balance_smd,
    "att_nearest_match": q_att_nearest_match,
    "placebo_permutation_test": q_placebo_permutation_test,
    "ipf_raking_2iter": q_ipf_raking_2iter,
}

CAUSAL_ORACLES = {
    "qini_curve": ORACLE_QINI_CURVE,
    "covariate_balance_smd": ORACLE_COVARIATE_BALANCE_SMD,
    "att_nearest_match": ORACLE_ATT_NEAREST_MATCH,
    "placebo_permutation_test": ORACLE_PLACEBO_PERMUTATION_TEST,
    "ipf_raking_2iter": ORACLE_IPF_RAKING_2ITER,
}

_q.QUERIES.update(CAUSAL_QUERIES)
_q.ORACLES.update(CAUSAL_ORACLES)
