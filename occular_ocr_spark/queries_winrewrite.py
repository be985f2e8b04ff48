"""Window-rewrite certification catalog, round 4 (wave 84): five
operators that verify, ON THE DATA, the window-function rewrites that
let a 100 TB plan replace corpus-sized windows with bounded-frame
algebra — the windowed companion to the join/agg identities of wave
73 (``queries_identities.py``).  Each entry computes BOTH spellings
independently and emits the components plus a ``matches`` flag; the
naive side exists precisely to be certified away (replacing it is the
scale win the certification licenses).

* ``lag_join_equiv`` — lag(revenue) over the complete month spine ≡
  self-join on month−1 (the spine is gap-filled, so the calendar join
  IS the lag); per-month both values + flag.
* ``rank_count_equiv`` — row-level rank() ORDER BY n_chars ≡ the
  value-histogram identity rank(v) = cum(v) − m(v) + 1 (the
  twice-rank trick every *_dist quantile entry relies on); per
  distinct value: the window side's min/max row rank (equal under
  ties by definition of rank) vs the histogram rank + flag.
* ``cumsum_scan_equiv`` — cumulative revenue window ≡ triangular
  self-join Σ_{{m'≤m}} over the bounded month frame; per month + flag.
* ``topn_pergroup_equiv`` — per-source top-{_TOPN} by
  (n_chars DESC, doc_id): row_number window vs the count-of-greater
  self-join rewrite; per selected (source, doc_id): both membership
  flags + agreement.
* ``firstlast_minmax_equiv`` — first_value/last_value over the full
  partition frame ≡ groupBy argmin/argmax via the packed integer key
  n_chars·10⁹ + doc_id (exact, engine-identical); per source + flag.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_winrewrite_wave.py (every matches flag must be
true on every fixture).

Cross-engine float policy: pure BIGINT counts, packed keys, and
integer revenue sums — no float in this wave.

Scale notes: the CERTIFIED spellings are all bounded (month-frame
windows, histogram ranks, packed-key partial aggs); the naive
spellings they're checked against (row-level rank window, within-group
count-of-greater join) run once here as the reference implementation —
the point of the certificate is that production plans never need
them.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t
from .queries_bigrowth import _MONTHLY_SQL, _monthly

_TOPN = 3


# ---------------------------------------------------------------------------
# lag_join_equiv
# ---------------------------------------------------------------------------


def q_lag_join_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() over the gap-filled month spine vs the month−1 calendar
    self-join — identical by spine completeness."""
    d = _q._persist_tracked(_monthly(spark, sf_dir))
    win = d.selectExpr(
        "month",
        "revenue",
        "lag(revenue) OVER (ORDER BY month) AS lag_value",
    ).where("lag_value IS NOT NULL")
    jn = d.alias("a").join(
        d.selectExpr("add_months(month, 1) AS month",
                     "revenue AS join_value"),
        "month",
    )
    return win.join(jn.select("month", "join_value"), "month").selectExpr(
        "month",
        "revenue",
        "lag_value",
        "join_value",
        "lag_value = join_value AS matches",
    )


ORACLE_LAG_JOIN_EQUIV = f"""
WITH {_MONTHLY_SQL},
win AS (
  SELECT month, revenue,
         lag(revenue) OVER (ORDER BY month) AS lag_value
  FROM monthly),
jn AS (
  SELECT CAST(month + INTERVAL 1 MONTH AS DATE) AS month,
         revenue AS join_value
  FROM monthly)
SELECT w.month, w.revenue, w.lag_value, j.join_value,
       w.lag_value = j.join_value AS matches
FROM win w JOIN jn j ON j.month = w.month
WHERE w.lag_value IS NOT NULL
"""


# ---------------------------------------------------------------------------
# rank_count_equiv
# ---------------------------------------------------------------------------


def q_rank_count_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level rank() vs the histogram identity
    rank(v) = cum(v) − m(v) + 1."""
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("long").alias("v"),
    )
    # naive side: the corpus-sized rank window (the thing certified away)
    naive = (
        d.selectExpr("v", "rank() OVER (ORDER BY v) AS rk")
        .groupBy("v")
        .agg(
            F.min("rk").cast("long").alias("win_rank_min"),
            F.max("rk").cast("long").alias("win_rank_max"),
        )
    )
    hist = d.groupBy("v").agg(F.count("*").cast("long").alias("m"))
    ranked = hist.selectExpr(
        "v",
        "m",
        "CAST(sum(m) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING"
        " AND CURRENT ROW) - m + 1 AS BIGINT) AS hist_rank",
    )
    return naive.join(ranked, "v").selectExpr(
        "v",
        "m",
        "win_rank_min",
        "win_rank_max",
        "hist_rank",
        "win_rank_min = hist_rank AND win_rank_max = hist_rank"
        " AS matches",
    )


ORACLE_RANK_COUNT_EQUIV = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(n_chars AS BIGINT) AS v
  FROM documents),
naive AS (
  SELECT v, CAST(min(rk) AS BIGINT) AS win_rank_min,
         CAST(max(rk) AS BIGINT) AS win_rank_max
  FROM (SELECT v, rank() OVER (ORDER BY v) AS rk FROM d) t
  GROUP BY v),
hist AS (
  SELECT v, CAST(count(*) AS BIGINT) AS m FROM d GROUP BY v),
ranked AS (
  SELECT v, m,
         CAST(sum(m) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
           PRECEDING AND CURRENT ROW) - m + 1 AS BIGINT) AS hist_rank
  FROM hist)
SELECT n.v, r.m, n.win_rank_min, n.win_rank_max, r.hist_rank,
       n.win_rank_min = r.hist_rank AND n.win_rank_max = r.hist_rank
         AS matches
FROM naive n JOIN ranked r ON r.v = n.v
"""


# ---------------------------------------------------------------------------
# cumsum_scan_equiv
# ---------------------------------------------------------------------------


def q_cumsum_scan_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window sum vs the triangular self-join over the
    bounded month frame."""
    d = _q._persist_tracked(_monthly(spark, sf_dir))
    win = d.selectExpr(
        "month",
        "CAST(sum(revenue) OVER (ORDER BY month ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) AS BIGINT) AS win_cum",
    )
    tri = (
        d.alias("a")
        .join(d.alias("b"), F.expr("b.month <= a.month"))
        .groupBy(F.expr("a.month").alias("month"))
        .agg(F.sum("b.revenue").cast("long").alias("join_cum"))
    )
    return win.join(tri, "month").selectExpr(
        "month",
        "win_cum",
        "join_cum",
        "win_cum = join_cum AS matches",
    )


ORACLE_CUMSUM_SCAN_EQUIV = f"""
WITH {_MONTHLY_SQL},
win AS (
  SELECT month,
         CAST(sum(revenue) OVER (ORDER BY month ROWS BETWEEN
           UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS win_cum
  FROM monthly),
tri AS (
  SELECT a.month, CAST(sum(b.revenue) AS BIGINT) AS join_cum
  FROM monthly a JOIN monthly b ON b.month <= a.month
  GROUP BY a.month)
SELECT w.month, w.win_cum, t.join_cum,
       w.win_cum = t.join_cum AS matches
FROM win w JOIN tri t ON t.month = w.month
"""


# ---------------------------------------------------------------------------
# topn_pergroup_equiv
# ---------------------------------------------------------------------------


def q_topn_pergroup_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top-N by (n_chars DESC, doc_id): row_number window
    vs the count-of-greater self-join rewrite."""
    d = _t(spark, sf_dir, "documents").select(
        "source",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("long").alias("v"),
    )
    win = (
        d.selectExpr(
            "source",
            "doc_id",
            "row_number() OVER (PARTITION BY source ORDER BY v DESC,"
            " doc_id) AS rn",
        )
        .where(f"rn <= {_TOPN}")
        .selectExpr("source", "doc_id", "1L AS in_window")
    )
    jn = (
        d.alias("a")
        .join(
            d.alias("b"),
            F.expr(
                "a.source = b.source AND (b.v > a.v OR (b.v = a.v AND"
                " b.doc_id < a.doc_id))"
            ),
            "left",
        )
        .groupBy(F.expr("a.source").alias("source"),
                 F.expr("a.doc_id").alias("doc_id"))
        .agg(F.count("b.doc_id").cast("long").alias("n_greater"))
        .where(f"n_greater < {_TOPN}")
        .selectExpr("source", "doc_id", "1L AS in_join")
    )
    return win.join(jn, ["source", "doc_id"], "full").selectExpr(
        "source",
        "doc_id",
        "coalesce(in_window, 0L) AS in_window",
        "coalesce(in_join, 0L) AS in_join",
        "coalesce(in_window, 0L) = coalesce(in_join, 0L) AS matches",
    )


ORACLE_TOPN_PERGROUP_EQUIV = f"""
WITH d AS (
  SELECT source, CAST(doc_id AS BIGINT) AS doc_id,
         CAST(n_chars AS BIGINT) AS v
  FROM documents),
win AS (
  SELECT source, doc_id, CAST(1 AS BIGINT) AS in_window
  FROM (SELECT source, doc_id,
          row_number() OVER (PARTITION BY source ORDER BY v DESC,
            doc_id) AS rn
        FROM d) t
  WHERE rn <= {_TOPN}),
jn AS (
  SELECT a.source, a.doc_id, CAST(1 AS BIGINT) AS in_join
  FROM d a LEFT JOIN d b
    ON a.source = b.source AND (b.v > a.v OR (b.v = a.v AND
       b.doc_id < a.doc_id))
  GROUP BY a.source, a.doc_id
  HAVING count(b.doc_id) < {_TOPN})
SELECT coalesce(w.source, j.source) AS source,
       coalesce(w.doc_id, j.doc_id) AS doc_id,
       coalesce(w.in_window, 0) AS in_window,
       coalesce(j.in_join, 0) AS in_join,
       coalesce(w.in_window, 0) = coalesce(j.in_join, 0) AS matches
FROM win w FULL OUTER JOIN jn j
  ON j.source = w.source AND j.doc_id = w.doc_id
"""


# ---------------------------------------------------------------------------
# firstlast_minmax_equiv
# ---------------------------------------------------------------------------


def q_firstlast_minmax_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last_value over the full partition frame vs groupBy
    argmin/argmax via the packed key v·10⁹ + doc_id."""
    d = _t(spark, sf_dir, "documents").select(
        "source",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("long").alias("v"),
    )
    win = d.selectExpr(
        "source",
        "first_value(doc_id) OVER (PARTITION BY source ORDER BY v,"
        " doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED"
        " FOLLOWING) AS first_doc_win",
        "last_value(doc_id) OVER (PARTITION BY source ORDER BY v,"
        " doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED"
        " FOLLOWING) AS last_doc_win",
    ).distinct()
    agg = d.groupBy("source").agg(
        F.expr("min(v * 1000000000 + doc_id) % 1000000000")
        .cast("long")
        .alias("first_doc_agg"),
        F.expr("max(v * 1000000000 + doc_id) % 1000000000")
        .cast("long")
        .alias("last_doc_agg"),
    )
    return win.join(agg, "source").selectExpr(
        "source",
        "first_doc_win",
        "last_doc_win",
        "first_doc_agg",
        "last_doc_agg",
        "first_doc_win = first_doc_agg AND last_doc_win = last_doc_agg"
        " AS matches",
    )


ORACLE_FIRSTLAST_MINMAX_EQUIV = """
WITH d AS (
  SELECT source, CAST(doc_id AS BIGINT) AS doc_id,
         CAST(n_chars AS BIGINT) AS v
  FROM documents),
win AS (
  SELECT DISTINCT source,
         first_value(doc_id) OVER (PARTITION BY source ORDER BY v,
           doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
           FOLLOWING) AS first_doc_win,
         last_value(doc_id) OVER (PARTITION BY source ORDER BY v,
           doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
           FOLLOWING) AS last_doc_win
  FROM d),
agg AS (
  SELECT source,
         CAST(min(v * 1000000000 + doc_id) % 1000000000 AS BIGINT)
           AS first_doc_agg,
         CAST(max(v * 1000000000 + doc_id) % 1000000000 AS BIGINT)
           AS last_doc_agg
  FROM d GROUP BY source)
SELECT w.source, w.first_doc_win, w.last_doc_win,
       a.first_doc_agg, a.last_doc_agg,
       w.first_doc_win = a.first_doc_agg AND
       w.last_doc_win = a.last_doc_agg AS matches
FROM win w JOIN agg a ON a.source = w.source
"""


WINREWRITE_QUERIES = {
    "lag_join_equiv": q_lag_join_equiv,
    "rank_count_equiv": q_rank_count_equiv,
    "cumsum_scan_equiv": q_cumsum_scan_equiv,
    "topn_pergroup_equiv": q_topn_pergroup_equiv,
    "firstlast_minmax_equiv": q_firstlast_minmax_equiv,
}

WINREWRITE_ORACLES = {
    "lag_join_equiv": ORACLE_LAG_JOIN_EQUIV,
    "rank_count_equiv": ORACLE_RANK_COUNT_EQUIV,
    "cumsum_scan_equiv": ORACLE_CUMSUM_SCAN_EQUIV,
    "topn_pergroup_equiv": ORACLE_TOPN_PERGROUP_EQUIV,
    "firstlast_minmax_equiv": ORACLE_FIRSTLAST_MINMAX_EQUIV,
}

_q.QUERIES.update(WINREWRITE_QUERIES)
_q.ORACLES.update(WINREWRITE_ORACLES)
