"""Transcript-analytics catalog, round 4 (wave 59): five more
operators on the CONVERSATION shape (conv_id, turn_idx, role, text,
tool) — the north rule's input table — built over the same
deterministic transcript synthesis as queries_transcript (shared
`_turns` / oracle CTE, so every entry exercises the gapped-turn,
role-violation corpus):

* ``turn_novelty`` — within-conversation vocabulary novelty: a turn's
  distinct tokens split into first-seen-here vs seen-in-an-earlier
  turn; per conversation the mean per-turn novelty ratio.  The
  repetition/degeneracy signal at TYPE level (``turn_self_repetition``
  measures within-turn token reuse; this measures cross-turn reuse).
* ``dialog_segments`` — conversation topic segmentation: token-set
  Jaccard between consecutive turns, a segment boundary wherever the
  overlap drops below {_DS_THRESH_MICRO} µ; per conversation the
  boundary count, segment count, and mean adjacent-turn Jaccard.
  The conversation-level analog of ``texttiling_boundaries`` (which
  segments single documents by block walls).
* ``context_overlap_audit`` — the token-duplication cost of
  ``context_windows``-style sliding-window packing: with a
  {_CO_CTX}-turn context, turn i is re-emitted once as a target and
  once per following turn within {_CO_CTX} ranks, so packed tokens =
  Σ nᵢ·(1 + min({_CO_CTX}, n_turns − posᵢ)); the audit reports the
  exact duplication factor per conversation — the storage/compute
  multiplier SFT packing pays before dedup.
* ``role_verbosity`` — per-conversation user vs assistant token
  economics: turn and token counts per role and the
  assistant:user token ratio (NULL where a side is silent) — the
  verbosity skew that decides assistant-turn loss weighting.
* ``tool_use_positions`` — where in a conversation tools fire:
  per-turn position decile (ceil(10·rank/n_turns)) × tool histogram
  over the corpus — early-search vs late-code patterns, bounded
  #tools×10 output.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus plan assertions in tests/test_transcript2_wave.py.

Cross-engine float policy: exact integers end-to-end — token counts,
Jaccards, novelty ratios, and duplication factors are all BIGINT with
half-up micro division at each rounding point.

Scale notes: every window partitions by conv_id (the north rule's
hash(conv_id) layout makes them local sorts); token explodes carry
(conv_id, rnk) so the adjacent-turn joins stay co-partitioned; no
global window anywhere; outputs are per-conversation (bounded by
#convs) or #tools×10 rows.

Reference parity: the reference engine is per-document
(Bodhi42/Occular-ocr); conversation structure is the cross-turn layer
the north rule adds (SURVEY.md §2, "LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t
from .queries_transcript import _ORACLE_TURNS_TOOL, _turns

_DS_THRESH_MICRO = 100_000  # boundary when adjacent Jaccard < 0.1
_CO_CTX = 3  # context turns, matching context_windows' _CTX_TURNS


def _ranked_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return _turns(spark, sf_dir).withColumn(
        "rnk", F.row_number().over(w)
    )


_RANKED_SQL = f"""
turns AS ({_ORACLE_TURNS_TOOL}),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS rnk
  FROM turns)
"""


def _turn_toks(ranked: DataFrame) -> DataFrame:
    """Distinct (conv_id, rnk, tok) per turn."""
    return (
        ranked.select(
            "conv_id",
            "rnk",
            F.explode(
                F.array_distinct(
                    F.expr("filter(split(text, ' '), x -> x <> '')")
                )
            ).alias("tok"),
        )
    )


_TURN_TOKS_SQL = """
toks AS (
  SELECT DISTINCT conv_id, rnk, unnest(
           list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM ranked)
"""


# ---------------------------------------------------------------------------
# turn_novelty
# ---------------------------------------------------------------------------


def q_turn_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation mean turn novelty: a turn's novelty =
    (#distinct tokens first seen at this turn) / (#distinct tokens in
    the turn), half-up micro per turn, then one more half-up division
    for the conversation mean.  First turns are 1.0 by construction
    (documented, not excluded).

    Scale: first-occurrence is a (conv, tok) partial-agg min(rnk)
    joined back on (conv, rnk, tok) — co-partitioned by conv_id; the
    rollups are conv-keyed partial aggs.
    """
    toks = _q._persist_tracked(
        _turn_toks(_ranked_turns(spark, sf_dir))
    )
    first = toks.groupBy("conv_id", "tok").agg(
        F.min("rnk").alias("first_rnk")
    )
    per_turn = (
        toks.join(first, ["conv_id", "tok"])
        .groupBy("conv_id", "rnk")
        .agg(
            F.count("*").alias("n_types"),
            F.sum(
                (F.col("rnk") == F.col("first_rnk")).cast("bigint")
            ).alias("n_new"),
        )
        .selectExpr(
            "conv_id",
            "n_types",
            "n_new",
            "CAST((2000000 * n_new + n_types) DIV (2 * n_types)"
            " AS BIGINT) AS nov_micro",
        )
    )
    return (
        per_turn.groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum("n_new").cast("long").alias("conv_vocab"),
            F.expr(
                "CAST((2 * sum(nov_micro) + count(*))"
                " DIV (2 * count(*)) AS BIGINT)"
            ).alias("mean_novelty_micro"),
        )
    )


ORACLE_TURN_NOVELTY = f"""
WITH {_RANKED_SQL},
{_TURN_TOKS_SQL},
first AS (
  SELECT conv_id, tok, min(rnk) AS first_rnk FROM toks GROUP BY 1, 2),
per_turn AS (
  SELECT t.conv_id, t.rnk,
         count(*) AS n_types,
         sum(CASE WHEN t.rnk = f.first_rnk THEN 1 ELSE 0 END) AS n_new
  FROM toks t JOIN first f ON f.conv_id = t.conv_id AND f.tok = t.tok
  GROUP BY 1, 2),
quant AS (
  SELECT conv_id, n_new,
         CAST(CAST(2000000 * n_new + n_types AS HUGEINT)
              // CAST(2 * n_types AS HUGEINT) AS BIGINT) AS nov_micro
  FROM per_turn)
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(n_new) AS BIGINT) AS conv_vocab,
       CAST(CAST(2 * sum(nov_micro) + count(*) AS HUGEINT)
            // CAST(2 * count(*) AS HUGEINT) AS BIGINT)
         AS mean_novelty_micro
FROM quant GROUP BY conv_id
"""


# ---------------------------------------------------------------------------
# dialog_segments
# ---------------------------------------------------------------------------


def q_dialog_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic segmentation by adjacent-turn token-set Jaccard: for each
    consecutive rank pair the exact micro Jaccard (zero-overlap pairs
    enter as exact 0); a boundary where jac < {_DS_THRESH_MICRO} µ;
    segments = boundaries + 1.  Single-turn conversations report one
    segment and NULL mean Jaccard.

    Scale: the intersection join runs on (conv_id, rnk) against
    (conv_id, rnk+1) — co-partitioned; per-turn sizes are one partial
    agg; everything rolls up conv-keyed.
    """
    ranked = _q._persist_tracked(_ranked_turns(spark, sf_dir))
    toks = _q._persist_tracked(_turn_toks(ranked))
    sizes = toks.groupBy("conv_id", "rnk").agg(
        F.count("*").alias("sz")
    )
    nxt = toks.selectExpr(
        "conv_id AS conv_b", "rnk - 1 AS rnk_b", "tok AS tok_b"
    )
    inter = (
        toks.join(
            nxt,
            (F.col("conv_id") == F.col("conv_b"))
            & (F.col("rnk") == F.col("rnk_b"))
            & (F.col("tok") == F.col("tok_b")),
        )
        .groupBy("conv_id", "rnk")
        .agg(F.count("*").alias("i"))
    )
    sz_b = sizes.selectExpr(
        "conv_id", "rnk - 1 AS rnk", "sz AS sz_next"
    )
    pairs = (
        sizes.join(sz_b, ["conv_id", "rnk"])
        .join(inter, ["conv_id", "rnk"], "left")
        .selectExpr(
            "conv_id",
            "coalesce(i, 0) AS i",
            "sz + sz_next - coalesce(i, 0) AS u",
        )
        .selectExpr(
            "conv_id",
            "CAST((2000000 * i + u) DIV (2 * u) AS BIGINT) AS jac_micro",
        )
    )
    nconv = ranked.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns")
    )
    agg = pairs.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(
            (F.col("jac_micro") < _DS_THRESH_MICRO).cast("bigint")
        )
        .cast("long")
        .alias("n_boundaries"),
        F.expr(
            "CAST((2 * sum(jac_micro) + count(*)) DIV (2 * count(*))"
            " AS BIGINT)"
        ).alias("mean_adj_jaccard_micro"),
    )
    return (
        nconv.join(agg, "conv_id", "left")
        .selectExpr(
            "conv_id",
            "n_turns",
            "coalesce(n_boundaries, 0) AS n_boundaries",
            "coalesce(n_boundaries, 0) + 1 AS n_segments",
            "mean_adj_jaccard_micro",
        )
    )


ORACLE_DIALOG_SEGMENTS = f"""
WITH {_RANKED_SQL},
{_TURN_TOKS_SQL},
sizes AS (
  SELECT conv_id, rnk, count(*) AS sz FROM toks GROUP BY 1, 2),
inter AS (
  SELECT a.conv_id, a.rnk, count(*) AS i
  FROM toks a JOIN toks b
    ON b.conv_id = a.conv_id AND b.rnk = a.rnk + 1 AND b.tok = a.tok
  GROUP BY 1, 2),
pairs AS (
  SELECT s.conv_id,
         CAST(CAST(2000000 * coalesce(i.i, 0)
                   + (s.sz + n.sz - coalesce(i.i, 0)) AS HUGEINT)
              // CAST(2 * (s.sz + n.sz - coalesce(i.i, 0)) AS HUGEINT)
              AS BIGINT) AS jac_micro
  FROM sizes s
  JOIN sizes n ON n.conv_id = s.conv_id AND n.rnk = s.rnk + 1
  LEFT JOIN inter i ON i.conv_id = s.conv_id AND i.rnk = s.rnk),
nconv AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns
  FROM ranked GROUP BY conv_id),
agg AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN jac_micro < {_DS_THRESH_MICRO}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_boundaries,
         CAST(CAST(2 * sum(jac_micro) + count(*) AS HUGEINT)
              // CAST(2 * count(*) AS HUGEINT) AS BIGINT)
           AS mean_adj_jaccard_micro
  FROM pairs GROUP BY conv_id)
SELECT n.conv_id, n.n_turns,
       coalesce(a.n_boundaries, 0) AS n_boundaries,
       coalesce(a.n_boundaries, 0) + 1 AS n_segments,
       a.mean_adj_jaccard_micro
FROM nconv n LEFT JOIN agg a USING (conv_id)
"""


# ---------------------------------------------------------------------------
# context_overlap_audit
# ---------------------------------------------------------------------------


def q_context_overlap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplication factor of {_CO_CTX}-turn sliding-window
    packing: packed = Σᵢ nᵢ·(1 + min({_CO_CTX}, n_turns − posᵢ))
    (once as target + once per context appearance), raw = Σ nᵢ;
    dup_factor_micro = halfup(1e6·packed, raw).

    Scale: per-turn token counts are map-side; n_turns is one
    conv-keyed partial agg joined back co-partitioned; no token ever
    crosses the wire (counts only).
    """
    ranked = _ranked_turns(spark, sf_dir).select(
        "conv_id",
        "rnk",
        F.size(
            F.expr("filter(split(text, ' '), x -> x <> '')")
        )
        .cast("long")
        .alias("n_tok"),
    )
    nconv = ranked.groupBy("conv_id").agg(
        F.max("rnk").cast("long").alias("n_turns")
    )
    return (
        ranked.join(nconv, "conv_id")
        .selectExpr(
            "conv_id",
            "n_turns",
            "n_tok",
            f"n_tok * (1 + least({_CO_CTX}, n_turns - rnk)) AS packed",
        )
        .groupBy("conv_id")
        .agg(
            F.max("n_turns").alias("n_turns"),
            F.sum("n_tok").cast("long").alias("raw_tokens"),
            F.sum("packed").cast("long").alias("packed_tokens"),
        )
        .selectExpr(
            "conv_id",
            "n_turns",
            "raw_tokens",
            "packed_tokens",
            "CAST((2000000 * packed_tokens + raw_tokens)"
            " DIV (2 * raw_tokens) AS BIGINT) AS dup_factor_micro",
        )
    )


ORACLE_CONTEXT_OVERLAP_AUDIT = f"""
WITH {_RANKED_SQL},
counts AS (
  SELECT conv_id, rnk,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tok
  FROM ranked),
nconv AS (
  SELECT conv_id, CAST(max(rnk) AS BIGINT) AS n_turns
  FROM counts GROUP BY conv_id),
packed AS (
  SELECT c.conv_id, n.n_turns, c.n_tok,
         c.n_tok * (1 + least({_CO_CTX}, n.n_turns - c.rnk)) AS packed
  FROM counts c JOIN nconv n USING (conv_id))
SELECT conv_id, max(n_turns) AS n_turns,
       CAST(sum(n_tok) AS BIGINT) AS raw_tokens,
       CAST(sum(packed) AS BIGINT) AS packed_tokens,
       CAST(CAST(2000000 * sum(packed) + sum(n_tok) AS HUGEINT)
            // CAST(2 * sum(n_tok) AS HUGEINT) AS BIGINT)
         AS dup_factor_micro
FROM packed GROUP BY conv_id
"""


# ---------------------------------------------------------------------------
# role_verbosity
# ---------------------------------------------------------------------------


def q_role_verbosity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation role economics: turn and token counts per role
    and the assistant:user token ratio (NULL when the user side is
    silent — the synthesis' role-violation class makes some
    conversations assistant-only).

    Scale: one conv-keyed conditional partial agg; map-side token
    counts.
    """
    t = _turns(spark, sf_dir).select(
        "conv_id",
        "role",
        F.size(
            F.expr("filter(split(text, ' '), x -> x <> '')")
        )
        .cast("long")
        .alias("n_tok"),
    )
    return (
        t.groupBy("conv_id")
        .agg(
            F.sum((F.col("role") == "user").cast("bigint"))
            .cast("long")
            .alias("n_user_turns"),
            F.sum((F.col("role") == "assistant").cast("bigint"))
            .cast("long")
            .alias("n_asst_turns"),
            F.sum(
                F.when(F.col("role") == "user", F.col("n_tok")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("user_tokens"),
            F.sum(
                F.when(
                    F.col("role") == "assistant", F.col("n_tok")
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("asst_tokens"),
        )
        .selectExpr(
            "conv_id",
            "n_user_turns",
            "n_asst_turns",
            "user_tokens",
            "asst_tokens",
            "CAST((2000000 * asst_tokens + nullif(user_tokens, 0))"
            " DIV nullif(2 * user_tokens, 0) AS BIGINT)"
            " AS verbosity_ratio_micro",
        )
    )


ORACLE_ROLE_VERBOSITY = f"""
WITH turns AS ({_ORACLE_TURNS_TOOL}),
counts AS (
  SELECT conv_id, role,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tok
  FROM turns),
agg AS (
  SELECT conv_id,
         CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_user_turns,
         CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_asst_turns,
         CAST(sum(CASE WHEN role = 'user' THEN n_tok ELSE 0 END)
              AS BIGINT) AS user_tokens,
         CAST(sum(CASE WHEN role = 'assistant' THEN n_tok ELSE 0 END)
              AS BIGINT) AS asst_tokens
  FROM counts GROUP BY conv_id)
SELECT conv_id, n_user_turns, n_asst_turns, user_tokens, asst_tokens,
       CAST(CAST(2000000 * asst_tokens + nullif(user_tokens, 0)
                 AS HUGEINT)
            // nullif(CAST(2 * user_tokens AS HUGEINT), 0) AS BIGINT)
         AS verbosity_ratio_micro
FROM agg
"""


# ---------------------------------------------------------------------------
# tool_use_positions
# ---------------------------------------------------------------------------


def q_tool_use_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus histogram of WHERE tools fire inside conversations:
    position decile = ceil(10·rnk/n_turns) per tool turn, counted per
    (tool, decile) — plus the per-cell share of the tool's calls.

    Scale: rank window + one conv-keyed count join (co-partitioned),
    then a ≤#tools×10-key partial agg.
    """
    ranked = _ranked_turns(spark, sf_dir)
    nconv = ranked.groupBy("conv_id").agg(
        F.max("rnk").alias("n_turns")
    )
    cells = (
        ranked.where(F.col("tool").isNotNull())
        .join(nconv, "conv_id")
        .selectExpr(
            "tool",
            "CAST((10 * rnk + n_turns - 1) DIV n_turns AS INT)"
            " AS decile",
        )
        .groupBy("tool", "decile")
        .agg(F.count("*").cast("long").alias("n_calls"))
    )
    tot = cells.groupBy("tool").agg(
        F.sum("n_calls").alias("tool_total")
    )
    return cells.join(F.broadcast(tot), "tool").selectExpr(
        "tool",
        "decile",
        "n_calls",
        "CAST((2000000 * n_calls + tool_total) DIV (2 * tool_total)"
        " AS BIGINT) AS share_micro",
    )


ORACLE_TOOL_USE_POSITIONS = f"""
WITH {_RANKED_SQL},
nconv AS (
  SELECT conv_id, max(rnk) AS n_turns FROM ranked GROUP BY conv_id),
cells AS (
  SELECT r.tool,
         CAST((10 * r.rnk + n.n_turns - 1) // n.n_turns AS INT)
           AS decile,
         CAST(count(*) AS BIGINT) AS n_calls
  FROM ranked r JOIN nconv n USING (conv_id)
  WHERE r.tool IS NOT NULL
  GROUP BY 1, 2),
tot AS (SELECT tool, sum(n_calls) AS tool_total FROM cells GROUP BY tool)
SELECT c.tool, c.decile, c.n_calls,
       CAST(CAST(2000000 * c.n_calls + t.tool_total AS HUGEINT)
            // CAST(2 * t.tool_total AS HUGEINT) AS BIGINT)
         AS share_micro
FROM cells c JOIN tot t USING (tool)
"""


TRANSCRIPT2_QUERIES = {
    "turn_novelty": q_turn_novelty,
    "dialog_segments": q_dialog_segments,
    "context_overlap_audit": q_context_overlap_audit,
    "role_verbosity": q_role_verbosity,
    "tool_use_positions": q_tool_use_positions,
}

TRANSCRIPT2_ORACLES = {
    "turn_novelty": ORACLE_TURN_NOVELTY,
    "dialog_segments": ORACLE_DIALOG_SEGMENTS,
    "context_overlap_audit": ORACLE_CONTEXT_OVERLAP_AUDIT,
    "role_verbosity": ORACLE_ROLE_VERBOSITY,
    "tool_use_positions": ORACLE_TOOL_USE_POSITIONS,
}

_q.QUERIES.update(TRANSCRIPT2_QUERIES)
_q.ORACLES.update(TRANSCRIPT2_ORACLES)
