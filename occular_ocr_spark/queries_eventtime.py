"""Event-time engineering catalog, round 4 (wave 71): five operators
that compute the watermark / lateness / session-gap decisions a
Structured Streaming job over 10^12 events must make BEFORE it runs —
from the data, not folklore.  The fixture's event_id is perfectly
event-time-ordered, so a deterministic bounded reorder models network
arrival: ``arrival key = event_id + H('a:'||event_id) % {_JITTER}``
(portable salted-md5 jitter), giving every audit a reproducible
out-of-order stream with displacement ≤ ~{_JITTER} on both engines.

* ``allowed_lateness_tradeoff`` — the watermark frontier: for delay
  W ∈ {_WM_SECS} seconds, how many arrivals a watermark at
  running-max(event time) - W would DROP (late) vs how many rows of
  window state stay OPEN at stream end — the two costs a delay
  choice trades.
* ``lateness_by_type`` — at the middle delay, per event_type late
  counts + half-up micro rates: which traffic class pays for a tight
  watermark.
* ``out_of_order_depth`` — displacement |rank_time - rank_arrival|:
  max, half-up micro mean, displaced share — the reorder-buffer
  depth the jitter model induces (and a real trace would reveal).
* ``session_gap_sensitivity`` — sessionization-parameter sweep: for
  gap G ∈ {_SG_SECS} seconds, total sessions and mean events per
  session — how session counts collapse as the gap grows.
* ``arrival_footrule`` — per user: Spearman-footrule distance
  Σ|rank_time - rank_arrival| between the two within-user orders,
  plus the max displacement — the per-key reorder bound a per-key
  state buffer must cover.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus plan assertions in tests/test_eventtime_wave.py.

Cross-engine float policy: exact integers (ranks, counts, interval
comparisons in native timestamp arithmetic — identical INTERVAL
literals on both engines); rates are single half-up micro divisions.

Scale notes: the arrival ranks are global windows here (two-level
rank at 10^12 rows, as documented at group_quantiles_dist); the
running-max prefix is one ordered window; everything aggregates to
≤ #delays / #types / #users rows.  session sweep windows partition
by user_id — the natural shard.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

_JITTER = 20
_WM_SECS = [0, 300, 900]
_SG_SECS = [1800, 3600, 7200]

_JIT_SPARK = (
    "event_id + CAST(conv(substr(md5(concat('a:',"
    " CAST(event_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
    f" % {_JITTER}"
)
_JIT_SQL = (
    "event_id + CAST(CAST('0x' || substr(md5('a:' ||"
    " CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) AS BIGINT)"
    f" % {_JITTER}"
)


def _arrivals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, user_id, event_type, ts, arrival rank, running max
    event time in arrival order)."""
    return (
        _t(spark, sf_dir, "events")
        .selectExpr(
            "event_id",
            "user_id",
            "event_type",
            "ts",
            f"{_JIT_SPARK} AS jit",
        )
        .selectExpr(
            "event_id",
            "user_id",
            "event_type",
            "ts",
            "row_number() OVER (ORDER BY jit, event_id) AS arr",
            "max(ts) OVER (ORDER BY jit, event_id"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            " AS wm_ts",
        )
    )


_ARRIVALS_SQL = f"""
arrivals AS (
  SELECT event_id, user_id, event_type, ts,
         row_number() OVER (ORDER BY jit, event_id) AS arr,
         max(ts) OVER (ORDER BY jit, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wm_ts
  FROM (
    SELECT event_id, user_id, event_type, ts, {_JIT_SQL} AS jit
    FROM events) j)
"""


# ---------------------------------------------------------------------------
# allowed_lateness_tradeoff
# ---------------------------------------------------------------------------


def q_allowed_lateness_tradeoff(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermark frontier: per delay W, arrivals a watermark at
    running-max - W drops, vs window-state rows still open at stream
    end (events within W of the final max event time).

    Scale: one arrival-ranked pass (two-level global window at
    10^12), then one partial agg per delay over the flag columns.
    """
    arr = _q._persist_tracked(_arrivals(spark, sf_dir))
    mx = arr.agg(F.max("ts").alias("max_ts"))
    outs = []
    for w in _WM_SECS:
        outs.append(
            arr.crossJoin(F.broadcast(mx))
            .selectExpr(
                f"CASE WHEN ts < wm_ts - INTERVAL {w} SECOND"
                " THEN 1 ELSE 0 END AS late",
                f"CASE WHEN ts > max_ts - INTERVAL {w} SECOND"
                " THEN 1 ELSE 0 END AS open_state",
            )
            .agg(
                F.count("*").cast("long").alias("n_events"),
                F.sum("late").cast("long").alias("dropped"),
                F.sum("open_state").cast("long").alias("state_rows"),
            )
            .selectExpr(
                f"CAST({w} AS BIGINT) AS delay_s",
                "n_events",
                "dropped",
                "state_rows",
                "CAST((2000000 * dropped + n_events) DIV (2 * n_events)"
                " AS BIGINT) AS dropped_micro",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def _lateness_oracle() -> str:
    sels = []
    for w in _WM_SECS:
        sels.append(
            f"""
SELECT CAST({w} AS BIGINT) AS delay_s,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN a.ts < a.wm_ts - INTERVAL {w} SECOND
                     THEN 1 ELSE 0 END) AS BIGINT) AS dropped,
       CAST(sum(CASE WHEN a.ts > m.max_ts - INTERVAL {w} SECOND
                     THEN 1 ELSE 0 END) AS BIGINT) AS state_rows,
       CAST((2000000 * sum(CASE WHEN a.ts < a.wm_ts - INTERVAL {w} SECOND
                 THEN 1 ELSE 0 END) + count(*))
            // (2 * count(*)) AS BIGINT) AS dropped_micro
FROM arrivals a CROSS JOIN (SELECT max(ts) AS max_ts FROM arrivals) m
"""
        )
    return f"WITH {_ARRIVALS_SQL}\n" + " UNION ALL ".join(sels)


ORACLE_ALLOWED_LATENESS_TRADEOFF = _lateness_oracle()


# ---------------------------------------------------------------------------
# lateness_by_type
# ---------------------------------------------------------------------------

_LT_W = _WM_SECS[1]


def q_lateness_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type lateness at the {_LT_W}-second watermark: which
    traffic class a tight delay actually drops.

    Scale: same arrival pass + one #types-row partial agg.
    """
    return (
        _arrivals(spark, sf_dir)
        .selectExpr(
            "event_type",
            f"CASE WHEN ts < wm_ts - INTERVAL {_LT_W} SECOND"
            " THEN 1 ELSE 0 END AS late",
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("late").cast("long").alias("n_late"),
        )
        .selectExpr(
            "event_type",
            "n_events",
            "n_late",
            "CAST((2000000 * n_late + n_events) DIV (2 * n_events)"
            " AS BIGINT) AS late_micro",
        )
    )


ORACLE_LATENESS_BY_TYPE = f"""
WITH {_ARRIVALS_SQL}
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN ts < wm_ts - INTERVAL {_LT_W} SECOND
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST((2000000 * sum(CASE WHEN ts < wm_ts - INTERVAL {_LT_W} SECOND
                 THEN 1 ELSE 0 END) + count(*)) // (2 * count(*))
            AS BIGINT) AS late_micro
FROM arrivals GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# out_of_order_depth
# ---------------------------------------------------------------------------


def q_out_of_order_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Displacement |rank_time - rank_arrival| over the whole stream:
    max, half-up micro mean, displaced share — the reorder-buffer
    depth requirement."""
    disp = _arrivals(spark, sf_dir).selectExpr(
        "arr",
        "row_number() OVER (ORDER BY ts, event_id) AS rt",
    ).selectExpr("abs(rt - arr) AS d")
    return disp.agg(
        F.count("*").cast("long").alias("n_events"),
        F.max("d").cast("long").alias("max_displacement"),
        F.sum("d").cast("long").alias("sum_d"),
        F.sum(F.expr("CASE WHEN d > 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_displaced"),
    ).selectExpr(
        "n_events",
        "max_displacement",
        "CAST((2000000 * sum_d + n_events) DIV (2 * n_events) AS BIGINT)"
        " AS mean_displacement_micro",
        "CAST((2000000 * n_displaced + n_events) DIV (2 * n_events)"
        " AS BIGINT) AS displaced_micro",
    )


ORACLE_OUT_OF_ORDER_DEPTH = f"""
WITH {_ARRIVALS_SQL},
disp AS (
  SELECT abs(row_number() OVER (ORDER BY ts, event_id) - arr) AS d
  FROM arrivals)
SELECT CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(d) AS BIGINT) AS max_displacement,
       CAST((2000000 * sum(d) + count(*)) // (2 * count(*)) AS BIGINT)
         AS mean_displacement_micro,
       CAST((2000000 * sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) + count(*))
            // (2 * count(*)) AS BIGINT) AS displaced_micro
FROM disp
"""


# ---------------------------------------------------------------------------
# session_gap_sensitivity
# ---------------------------------------------------------------------------


def q_session_gap_sensitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Session counts vs the gap parameter: for G seconds, sessions =
    users + Σ(gaps > G); mean events/session in half-up micro.

    Scale: one per-user lag window, then one partial agg per G over
    the boundary flags.
    """
    gaps = _q._persist_tracked(
        _t(spark, sf_dir, "events").selectExpr(
            "user_id",
            "ts",
            "lag(ts) OVER (PARTITION BY user_id"
            " ORDER BY ts, event_id) AS prev_ts",
        )
    )
    outs = []
    for g in _SG_SECS:
        outs.append(
            gaps.selectExpr(
                "user_id",
                "CASE WHEN prev_ts IS NULL"
                f" OR ts > prev_ts + INTERVAL {g} SECOND"
                " THEN 1 ELSE 0 END AS boundary",
            )
            .agg(
                F.count("*").cast("long").alias("n_events"),
                F.sum("boundary").cast("long").alias("n_sessions"),
            )
            .selectExpr(
                f"CAST({g} AS BIGINT) AS gap_s",
                "n_events",
                "n_sessions",
                "CAST((2000000 * n_events + n_sessions)"
                " DIV (2 * n_sessions) AS BIGINT)"
                " AS mean_events_micro",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def _session_oracle() -> str:
    sels = []
    for g in _SG_SECS:
        sels.append(
            f"""
SELECT CAST({g} AS BIGINT) AS gap_s,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN prev_ts IS NULL
                     OR ts > prev_ts + INTERVAL {g} SECOND
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       CAST((2000000 * count(*) + sum(CASE WHEN prev_ts IS NULL
                 OR ts > prev_ts + INTERVAL {g} SECOND THEN 1 ELSE 0 END))
            // (2 * sum(CASE WHEN prev_ts IS NULL
                 OR ts > prev_ts + INTERVAL {g} SECOND THEN 1 ELSE 0 END))
            AS BIGINT) AS mean_events_micro
FROM gaps
"""
        )
    return (
        """WITH gaps AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_ts
  FROM events)
"""
        + " UNION ALL ".join(sels)
    )


ORACLE_SESSION_GAP_SENSITIVITY = _session_oracle()


# ---------------------------------------------------------------------------
# arrival_footrule
# ---------------------------------------------------------------------------


def q_arrival_footrule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Spearman footrule between within-user event-time and
    arrival orders, plus max displacement — the per-key reorder bound
    a keyed state buffer must cover."""
    ranked = _arrivals(spark, sf_dir).selectExpr(
        "user_id",
        "row_number() OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id) AS rt",
        "row_number() OVER (PARTITION BY user_id ORDER BY arr) AS ra",
    )
    return (
        ranked.selectExpr("user_id", "abs(rt - ra) AS d")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("d").cast("long").alias("footrule"),
            F.max("d").cast("long").alias("max_displacement"),
        )
    )


ORACLE_ARRIVAL_FOOTRULE = f"""
WITH {_ARRIVALS_SQL},
ranked AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rt,
         row_number() OVER (PARTITION BY user_id ORDER BY arr) AS ra
  FROM arrivals)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(abs(rt - ra)) AS BIGINT) AS footrule,
       CAST(max(abs(rt - ra)) AS BIGINT) AS max_displacement
FROM ranked GROUP BY user_id
"""


EVENTTIME_QUERIES = {
    "allowed_lateness_tradeoff": q_allowed_lateness_tradeoff,
    "lateness_by_type": q_lateness_by_type,
    "out_of_order_depth": q_out_of_order_depth,
    "session_gap_sensitivity": q_session_gap_sensitivity,
    "arrival_footrule": q_arrival_footrule,
}

EVENTTIME_ORACLES = {
    "allowed_lateness_tradeoff": ORACLE_ALLOWED_LATENESS_TRADEOFF,
    "lateness_by_type": ORACLE_LATENESS_BY_TYPE,
    "out_of_order_depth": ORACLE_OUT_OF_ORDER_DEPTH,
    "session_gap_sensitivity": ORACLE_SESSION_GAP_SENSITIVITY,
    "arrival_footrule": ORACLE_ARRIVAL_FOOTRULE,
}

_q.QUERIES.update(EVENTTIME_QUERIES)
_q.ORACLES.update(EVENTTIME_ORACLES)
