"""Attribution catalog, round 4 (wave 91): five multi-touch
attribution operators over the events stream — the marketing-science
suite (exact coalition Shapley, removal-effect bounds, positional and
time-decay credit, model divergence) beside the existing last-touch
entry.  Conversion = a user's FIRST 'purchase' event; touches = that
user's non-purchase events strictly before it (per-user windows,
bounded by per-user event counts); channels = the 4 non-purchase
event types.

* ``shapley_attribution`` — the exact data-driven Shapley value over
  exposure-set coalitions: per user the channel bitmask (4 bits,
  alphabetical) and converted flag → the ≤16-row subset table;
  v(S) = conversion rate of users with exposure set EXACTLY S (0 for
  unobserved sets, documented); φ_c = Σ_{{S∌c}} |S|!(3−|S|)!/4! ·
  (v(S∪c) − v(S)), every term an exact rational sign-split to micro
  before summing (quantized-term Shapley).
* ``removal_effect_bounds`` — per channel: the necessity upper bound
  (conversions whose pre-purchase path touches c / all conversions)
  and the exclusive lower bound (conversions where c is the ONLY
  channel) — the path-blocking bracket around any removal-effect
  model.
* ``position_attribution_compare`` — per channel: first-touch count,
  last-touch count, and linear credit (1/path_len per touch,
  per-touch half-up micro) — the three positional models side by
  side.
* ``time_decay_attribution`` — dyadic exponential decay: a touch
  {_TD_HALFLIFE} days before conversion is worth 1/2^(days DIV
  {_TD_HALFLIFE}) (exact dyadic micro, exponent capped at {_TD_CAP});
  per-user normalized to 1, per-touch quantized, summed per channel.
* ``attribution_model_divergence`` — pairwise L1 distance in micro
  between the normalized credit vectors of the first/last/linear/
  decay models (all recomputed in one DAG over the same touch
  table) — how much the model choice moves budget.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests in tests/test_attribution_wave.py.

Cross-engine float policy: pure exact BIGINT rationals, sign-split
half-up micro; dyadic weights are exact integer divisions by powers
of two — no floating point in this wave.

Scale notes: touches come from one per-user window pass (partition =
user, frames bounded by per-user event counts — the last-touch
doctrine); everything after is partial aggs over the ≤16-row subset
table, the 4-row channel frame, or per-user path aggregates; no
corpus-sized window, no driver loop.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_TD_HALFLIFE = 7
_TD_CAP = 20
_CHANNELS = ["click", "error", "signup", "view"]


def _touch_sql(dialect: str) -> str:
    """Per-user first-purchase time + pre-purchase touches."""
    return """
ev AS (
  SELECT CAST(user_id AS BIGINT) AS u, event_type AS ch, ts
  FROM events),
conv AS (
  SELECT u, min(ts) AS conv_ts FROM ev
  WHERE ch = 'purchase' GROUP BY u),
touches AS (
  SELECT e.u, e.ch, e.ts, c.conv_ts
  FROM ev e JOIN conv c ON c.u = e.u
  WHERE e.ch <> 'purchase' AND e.ts < c.conv_ts)
"""


# ---------------------------------------------------------------------------
# shapley_attribution
# ---------------------------------------------------------------------------


def _shapley_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    # 4-bit masks, channels alphabetical; Shapley weights w(s) =
    # s!(3-s)!/4! => denominators {4,12,12,4} for s=0..3
    wnum = {0: 6, 1: 2, 2: 2, 3: 6}  # w(s) = wnum[s]/24
    chan_bit = {c: 1 << i for i, c in enumerate(_CHANNELS)}
    bits = " + ".join(
        f"max(CASE WHEN ch = '{c}' THEN {b} ELSE 0 END)"
        for c, b in chan_bit.items()
    )
    # enumerate (channel, S without c) pairs as a constant grid
    rows = []
    for c, b in chan_bit.items():
        for s in range(16):
            if s & b:
                continue
            rows.append(f"('{c}', {s}, {s | b}, {wnum[bin(s).count('1')]})")
    grid = ", ".join(rows)
    return f"""
WITH ev AS (
  SELECT CAST(user_id AS BIGINT) AS u, event_type AS ch
  FROM events),
per_user AS (
  SELECT u,
         CAST({bits} AS BIGINT) AS mask,
         CAST(max(CASE WHEN ch = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS conv
  FROM ev GROUP BY u),
subsets AS (
  SELECT mask, CAST(count(*) AS BIGINT) AS users,
         CAST(sum(conv) AS BIGINT) AS convs
  FROM per_user GROUP BY mask),
grid AS (
  SELECT * FROM (VALUES {grid})
    AS t(channel, s_without, s_with, w_num)),
terms AS (
  SELECT g.channel,
         coalesce(a.convs, 0) AS cw, coalesce(a.users, 0) AS nw,
         coalesce(b.convs, 0) AS co, coalesce(b.users, 0) AS no_,
         g.w_num
  FROM grid g
  LEFT JOIN subsets a ON a.mask = g.s_with
  LEFT JOIN subsets b ON b.mask = g.s_without),
scored AS (
  SELECT channel,
         -- term = w * (v(S+c) - v(S)); v of unobserved set = 0;
         -- exact rational with denominator 24*nw*no_ (guarded)
         CASE
           WHEN nw > 0 AND no_ > 0 THEN
             CASE WHEN cw * no_ - co * nw >= 0 THEN
               CAST((2000000 * w_num * (cw * no_ - co * nw)
                    + 24 * nw * no_) {intdiv} (2 * 24 * nw * no_)
                    AS BIGINT)
             ELSE -CAST((2000000 * w_num * (co * nw - cw * no_)
                    + 24 * nw * no_) {intdiv} (2 * 24 * nw * no_)
                    AS BIGINT) END
           WHEN nw > 0 THEN
             CAST((2000000 * w_num * cw + 24 * nw)
                  {intdiv} (2 * 24 * nw) AS BIGINT)
           WHEN no_ > 0 THEN
             -CAST((2000000 * w_num * co + 24 * no_)
                  {intdiv} (2 * 24 * no_) AS BIGINT)
           ELSE CAST(0 AS BIGINT)
         END AS term_micro
  FROM terms)
SELECT channel,
       CAST(sum(term_micro) AS BIGINT) AS shapley_micro
FROM scored GROUP BY channel
"""


def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact coalition Shapley over exposure-set subsets."""
    _q._register_views(spark, sf_dir, ["events"])
    return spark.sql(_shapley_sql("spark"))


ORACLE_SHAPLEY_ATTRIBUTION = _shapley_sql("duck")


# ---------------------------------------------------------------------------
# removal_effect_bounds
# ---------------------------------------------------------------------------


def _removal_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    chans = ", ".join(f"('{c}')" for c in _CHANNELS)
    return f"""
WITH {_touch_sql(dialect)},
paths AS (
  SELECT u,
         count(DISTINCT ch) AS n_channels
  FROM touches GROUP BY u),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_conv FROM paths),
chans AS (SELECT * FROM (VALUES {chans}) AS t(channel)),
per AS (
  SELECT c.channel,
         CAST(count(DISTINCT t.u) AS BIGINT) AS conv_with,
         CAST(count(DISTINCT CASE WHEN p.n_channels = 1 THEN t.u END)
              AS BIGINT) AS conv_only
  FROM chans c
  LEFT JOIN touches t ON t.ch = c.channel
  LEFT JOIN paths p ON p.u = t.u
  GROUP BY c.channel)
SELECT p.channel, p.conv_with, p.conv_only, t.n_conv,
       CAST((2000000 * p.conv_with + t.n_conv) {intdiv} (2 * t.n_conv)
            AS BIGINT) AS upper_bound_micro,
       CAST((2000000 * p.conv_only + t.n_conv) {intdiv} (2 * t.n_conv)
            AS BIGINT) AS lower_bound_micro
FROM per p CROSS JOIN tot t
"""


def q_removal_effect_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per channel: path-blocking necessity bounds around any
    removal-effect model."""
    _q._register_views(spark, sf_dir, ["events"])
    return spark.sql(_removal_sql("spark"))


ORACLE_REMOVAL_EFFECT_BOUNDS = _removal_sql("duck")


# ---------------------------------------------------------------------------
# position_attribution_compare
# ---------------------------------------------------------------------------


def _position_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH {_touch_sql(dialect)},
ranked AS (
  SELECT u, ch,
         row_number() OVER (PARTITION BY u ORDER BY ts, ch) AS rn,
         count(*) OVER (PARTITION BY u) AS path_len
  FROM touches)
SELECT ch AS channel,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS first_touch,
       CAST(sum(CASE WHEN rn = path_len THEN 1 ELSE 0 END) AS BIGINT)
         AS last_touch,
       CAST(sum((2000000 + path_len) {intdiv} (2 * path_len))
            AS BIGINT) AS linear_credit_micro
FROM ranked GROUP BY ch
"""


def q_position_attribution_compare(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First/last/linear credits per channel in one pass."""
    _q._register_views(spark, sf_dir, ["events"])
    return spark.sql(_position_sql("spark"))


ORACLE_POSITION_ATTRIBUTION_COMPARE = _position_sql("duck")


# ---------------------------------------------------------------------------
# time_decay_attribution
# ---------------------------------------------------------------------------


def _decay_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    days = (
        "CAST(datediff(CAST(conv_ts AS DATE), CAST(ts AS DATE)) AS BIGINT)"
        if dialect == "spark"
        else "CAST(CAST(conv_ts AS DATE) - CAST(ts AS DATE) AS BIGINT)"
    )
    pow2 = (
        "CAST(power(2, least(CAST({e} AS INT), " + str(_TD_CAP) + ")) AS BIGINT)"
    )
    exp = f"({days}) {intdiv} {_TD_HALFLIFE}"
    w = f"(1000000 {intdiv} {pow2.format(e=exp)})"
    return f"""
WITH {_touch_sql(dialect)},
wt AS (
  SELECT u, ch, {w} AS w_micro
  FROM touches),
norm AS (
  SELECT u, CAST(sum(w_micro) AS BIGINT) AS w_tot FROM wt GROUP BY u),
credit AS (
  SELECT w.ch,
         CAST((2000000 * w.w_micro + n.w_tot) {intdiv} (2 * n.w_tot)
              AS BIGINT) AS credit_micro
  FROM wt w JOIN norm n ON n.u = w.u WHERE n.w_tot > 0)
SELECT ch AS channel,
       CAST(count(*) AS BIGINT) AS touches,
       CAST(sum(credit_micro) AS BIGINT) AS decay_credit_micro
FROM credit GROUP BY ch
"""


def q_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dyadic time-decay credits per channel, per-user normalized."""
    _q._register_views(spark, sf_dir, ["events"])
    return spark.sql(_decay_sql("spark"))


ORACLE_TIME_DECAY_ATTRIBUTION = _decay_sql("duck")


# ---------------------------------------------------------------------------
# attribution_model_divergence
# ---------------------------------------------------------------------------


def _divergence_sql(dialect: str) -> str:
    intdiv = "DIV" if dialect == "spark" else "//"
    days = (
        "CAST(datediff(CAST(conv_ts AS DATE), CAST(ts AS DATE)) AS BIGINT)"
        if dialect == "spark"
        else "CAST(CAST(conv_ts AS DATE) - CAST(ts AS DATE) AS BIGINT)"
    )
    exp = f"({days}) {intdiv} {_TD_HALFLIFE}"
    pow2 = (
        f"CAST(power(2, least(CAST({exp} AS INT), {_TD_CAP})) AS BIGINT)"
    )
    w = f"(1000000 {intdiv} {pow2})"
    return f"""
WITH {_touch_sql(dialect)},
ranked AS (
  SELECT u, ch, ts, conv_ts,
         row_number() OVER (PARTITION BY u ORDER BY ts, ch) AS rn,
         count(*) OVER (PARTITION BY u) AS path_len
  FROM touches),
credits AS (
  SELECT ch,
         CAST(sum(CASE WHEN rn = 1 THEN 1000000 ELSE 0 END)
              AS BIGINT) AS c_first,
         CAST(sum(CASE WHEN rn = path_len THEN 1000000 ELSE 0 END)
              AS BIGINT) AS c_last,
         CAST(sum((2000000 + path_len) {intdiv} (2 * path_len))
              AS BIGINT) AS c_linear,
         CAST(sum(dc) AS BIGINT) AS c_decay
  FROM (
    SELECT r.u, r.ch, r.rn, r.path_len,
           CAST((2000000 * ({w}) + n.w_tot) {intdiv} (2 * n.w_tot)
                AS BIGINT) AS dc
    FROM ranked r JOIN (
      SELECT u, CAST(sum({w}) AS BIGINT) AS w_tot
      FROM ranked GROUP BY u) n ON n.u = r.u
    WHERE n.w_tot > 0) t
  GROUP BY ch),
norm AS (
  SELECT ch,
         CAST((2000000 * c_first + sum(c_first) OVER ())
              {intdiv} (2 * sum(c_first) OVER ()) AS BIGINT) AS p_first,
         CAST((2000000 * c_last + sum(c_last) OVER ())
              {intdiv} (2 * sum(c_last) OVER ()) AS BIGINT) AS p_last,
         CAST((2000000 * c_linear + sum(c_linear) OVER ())
              {intdiv} (2 * sum(c_linear) OVER ()) AS BIGINT)
           AS p_linear,
         CAST((2000000 * c_decay + sum(c_decay) OVER ())
              {intdiv} (2 * sum(c_decay) OVER ()) AS BIGINT)
           AS p_decay
  FROM credits),
pairs AS (
  SELECT 'first_vs_last' AS pair,
         CAST(sum(abs(p_first - p_last)) AS BIGINT) AS l1_micro
  FROM norm
  UNION ALL
  SELECT 'first_vs_linear',
         CAST(sum(abs(p_first - p_linear)) AS BIGINT) FROM norm
  UNION ALL
  SELECT 'first_vs_decay',
         CAST(sum(abs(p_first - p_decay)) AS BIGINT) FROM norm
  UNION ALL
  SELECT 'last_vs_linear',
         CAST(sum(abs(p_last - p_linear)) AS BIGINT) FROM norm
  UNION ALL
  SELECT 'last_vs_decay',
         CAST(sum(abs(p_last - p_decay)) AS BIGINT) FROM norm
  UNION ALL
  SELECT 'linear_vs_decay',
         CAST(sum(abs(p_linear - p_decay)) AS BIGINT) FROM norm)
SELECT pair, l1_micro FROM pairs
"""


def q_attribution_model_divergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise L1 between the four models' normalized channel credit
    vectors."""
    _q._register_views(spark, sf_dir, ["events"])
    return spark.sql(_divergence_sql("spark"))


ORACLE_ATTRIBUTION_MODEL_DIVERGENCE = _divergence_sql("duck")


ATTRIBUTION_QUERIES = {
    "shapley_attribution": q_shapley_attribution,
    "removal_effect_bounds": q_removal_effect_bounds,
    "position_attribution_compare": q_position_attribution_compare,
    "time_decay_attribution": q_time_decay_attribution,
    "attribution_model_divergence": q_attribution_model_divergence,
}

ATTRIBUTION_ORACLES = {
    "shapley_attribution": ORACLE_SHAPLEY_ATTRIBUTION,
    "removal_effect_bounds": ORACLE_REMOVAL_EFFECT_BOUNDS,
    "position_attribution_compare": ORACLE_POSITION_ATTRIBUTION_COMPARE,
    "time_decay_attribution": ORACLE_TIME_DECAY_ATTRIBUTION,
    "attribution_model_divergence": ORACLE_ATTRIBUTION_MODEL_DIVERGENCE,
}

_q.QUERIES.update(ATTRIBUTION_QUERIES)
_q.ORACLES.update(ATTRIBUTION_ORACLES)
