"""Corpus-shape & graph-ops catalog, round 4 (wave 30): five operators
spanning the embedding, layout, graph, transcript, and n-gram surfaces —

* ``embedding_norm_audit`` — per-label L2-norm statistics of the
  embedding column with micro-unit integer quantization end-to-end:
  the "are these vectors normalized / is a label collapsing to zero
  vectors?" audit run before any cosine machinery is trusted.
* ``clustering_depth`` — max interval-stabbing depth of per-file
  [min, max] zone ranges under the two ``zone_map_prune`` layouts:
  the Iceberg-style clustering metric ("how many files must a point
  lookup open") that decides when a table needs re-clustering.
* ``link_prediction_jaccard`` — common-neighbor Jaccard scores for
  distance-2 non-edges of the shared-shingle co-occurrence graph: the
  classic link-prediction baseline, proposing "probably also related"
  pairs the blocking joins never scheduled (the verified near-dup
  graph itself is ≈fully transitive, so the weaker-tie graph is the
  substrate with open wedges).
* ``role_balance`` — per-conversation user/assistant token balance
  over the synthesized transcript table: the conversational-shape
  signal ("is this a monologue?") next to ``turn_take_entropy``'s
  alternation view.
* ``ngram_topk_coverage`` — exact cumulative corpus coverage of the
  top-k most frequent 3-word shingles at k ∈ {10, 100, 1000}, computed
  from the compressed (count, multiplicity) histogram: the
  "how templated is this corpus" curve behind boilerplate budgeting.

House contract: DuckDB value-hash oracle with identical aliases,
self-registration into queries.QUERIES / ORACLES on import, semantics
tests plus physical-plan assertions in tests/test_shape_wave.py.

Cross-engine float policy: embedding squares are quantized to nano-unit
BIGINTs per ELEMENT (so the only cross-row float sum becomes an exact
integer sum); clustering depth and coverage are integers end-to-end
with half-up micro-divisions at the surface; link-prediction Jaccard
divides exact integer neighbor counts.

Reference parity: axis-B net-new corpus ops (the reference
Bodhi42/Occular-ocr engine is per-document OCR only; SURVEY.md §2,
"LLM-data pipeline ops").  Extends the vector family
(``embed_quantize_int8`` queries.py — same quantization doctrine), the
storage family (``zone_map_prune`` queries_rankstats.py — same
synthetic layouts, deeper metric), the graph family
(``dedup_transitivity`` queries_dedupqa.py — the wedge kernel reused
for link proposals), the transcript family (``_turns``
queries_transcript.py) and the concentration family
(``gini_concentration`` — the compressed count-histogram trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _shingles, _t
from .queries_rankstats import _ZM_FILES, _ZM_WIDTH
from .queries_transcript import _ORACLE_TURNS, _turns

# ---------------------------------------------------------------------------
# embedding_norm_audit
# ---------------------------------------------------------------------------


def q_embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label audit of embedding L2 norms: vector count, min / max /
    mean norm in exact micro-units, and the zero-vector count.

    Determinism doctrine: a float sum's value depends on summation
    order, which neither engine guarantees — so every element's square
    is quantized to a nano-unit BIGINT (round(x²·10⁹)) FIRST, making
    the per-vector reduction and the per-label mean exact integer
    arithmetic; the norm is then sqrt of one deterministic integer.
    The quantization bias (≤ 0.5 nano-unit per element) is identical
    on both engines.

    Scale: posexplode → per-element map arithmetic → ONE
    partial-aggregated groupBy(vec_id) (dim-bounded rows per vector) →
    a per-label rollup.  No windows, no joins.
    """
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.explode("embedding").alias("x")
    )
    sq = e.select(
        "vec_id",
        "label",
        F.round(F.col("x").cast("double") * F.col("x").cast("double") * 1e9, 0)
        .cast("bigint")
        .alias("q"),
    )
    per_vec = sq.groupBy("vec_id", "label").agg(F.sum("q").alias("s"))
    norm_micro = (
        F.round(F.sqrt(F.col("s").cast("double") / 1e9) * 1e6, 0)
        .cast("bigint")
        .alias("norm_micro")
    )
    v = per_vec.select("label", norm_micro, F.col("s"))
    return (
        v.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.min("norm_micro").alias("min_norm_micro"),
            F.max("norm_micro").alias("max_norm_micro"),
            F.sum("norm_micro").alias("sum_nm"),
            F.sum(F.when(F.col("s") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("zero_vecs"),
        )
        .select(
            "label",
            "n_vecs",
            "min_norm_micro",
            "max_norm_micro",
            F.expr("(2 * sum_nm + n_vecs) DIV (2 * n_vecs)")
            .cast("bigint")
            .alias("avg_norm_micro"),
            "zero_vecs",
        )
    )


ORACLE_EMBEDDING_NORM_AUDIT = """
WITH el AS (
  SELECT vec_id, label, unnest(embedding) AS x FROM embeddings),
sq AS (
  SELECT vec_id, label,
         CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e9, 0) AS BIGINT) AS q
  FROM el),
per_vec AS (
  SELECT vec_id, label, CAST(sum(q) AS BIGINT) AS s
  FROM sq GROUP BY vec_id, label),
v AS (
  SELECT label,
         CAST(round(sqrt(CAST(s AS DOUBLE) / 1e9) * 1e6, 0) AS BIGINT)
           AS norm_micro,
         s
  FROM per_vec)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       min(norm_micro) AS min_norm_micro,
       max(norm_micro) AS max_norm_micro,
       CAST((2 * sum(norm_micro) + count(*)) // (2 * count(*)) AS BIGINT)
         AS avg_norm_micro,
       CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_vecs
FROM v
GROUP BY label
"""


# ---------------------------------------------------------------------------
# clustering_depth
# ---------------------------------------------------------------------------


def _clustering_depth_sql(dialect: str) -> str:
    """Dual-dialect interval-stabbing depth over per-file zone ranges:
    depth(p) = #files with zmin ≤ p ≤ zmax, evaluated at every distinct
    boundary position via two prefix sums over the per-POSITION start /
    end counts — GROUP BY position first, so tie order inside a
    position can never change the running value (closed intervals:
    starts at p count before ends below p are subtracted)."""
    strtype = "STRING" if dialect == "spark" else "VARCHAR"
    div = "DIV" if dialect == "spark" else "//"
    hexv = (
        lambda j: f"(instr('0123456789abcdef', substr(md5(CAST(doc_id AS {strtype})), {j}, 1)) - 1)"
    )
    h16 = f"((({hexv(1)} * 16 + {hexv(2)}) * 16 + {hexv(3)}) * 16 + {hexv(4)})"
    return f"""
WITH assigned AS (
  SELECT 'hash' AS layout, CAST({h16} % {_ZM_FILES} AS INT) AS file_id,
         CAST(n_chars AS BIGINT) AS n_chars
  FROM documents
  UNION ALL
  SELECT 'bychars' AS layout, CAST(n_chars {div} {_ZM_WIDTH} AS INT) AS file_id,
         CAST(n_chars AS BIGINT) AS n_chars
  FROM documents),
zones AS (
  SELECT layout, file_id, min(n_chars) AS zmin, max(n_chars) AS zmax
  FROM assigned GROUP BY layout, file_id),
starts AS (
  SELECT layout, zmin AS pos, CAST(count(*) AS BIGINT) AS c
  FROM zones GROUP BY layout, zmin),
ends AS (
  SELECT layout, zmax AS pos, CAST(count(*) AS BIGINT) AS c
  FROM zones GROUP BY layout, zmax),
pos AS (
  SELECT layout, pos,
         CAST(coalesce(sum(sc), 0) AS BIGINT) AS n_start,
         CAST(coalesce(sum(ec), 0) AS BIGINT) AS n_end
  FROM (
    SELECT layout, pos, c AS sc, CAST(NULL AS BIGINT) AS ec FROM starts
    UNION ALL
    SELECT layout, pos, CAST(NULL AS BIGINT) AS sc, c AS ec FROM ends)
  GROUP BY layout, pos),
depths AS (
  SELECT layout, pos,
         sum(n_start) OVER (PARTITION BY layout ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - coalesce(sum(n_end) OVER (PARTITION BY layout ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS depth
  FROM pos),
nf AS (
  SELECT layout, CAST(count(*) AS BIGINT) AS n_files
  FROM zones GROUP BY layout)
SELECT d.layout, nf.n_files, CAST(max(d.depth) AS BIGINT) AS max_depth
FROM depths d JOIN nf ON nf.layout = d.layout
GROUP BY d.layout, nf.n_files
"""


def q_clustering_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-depth audit of the two synthetic layouts: the maximum
    number of files whose [min, max] zone ranges overlap at any point
    of the ``n_chars`` domain — Iceberg's re-clustering trigger metric
    (depth 1 = perfectly clustered, a point lookup opens one file;
    depth = #files = fully interleaved, every lookup opens everything).
    The hash layout should sit at full depth, the value-bucketed layout
    at 1 — the pair quantifies what ``zorder_cluster`` buys.

    Scale: zone maps are ONE partial-aggregated groupBy; the sweep
    runs over per-POSITION counts (≤ 2·#files rows — bounded frames),
    so the global windows never see data-sized input.  Integers
    end-to-end.
    """
    _q._register_views(spark, sf_dir, ["documents"])
    return spark.sql(_clustering_depth_sql("spark"))


ORACLE_CLUSTERING_DEPTH = _clustering_depth_sql("duck")


# ---------------------------------------------------------------------------
# link_prediction_jaccard
# ---------------------------------------------------------------------------


_LP_MIN_SHARED = 3   # edge: documents sharing ≥ this many distinct shingles
_LP_SH_CAP = 100     # hot-shingle document-frequency cap (the ngram cap)
_LP_DEG_CAP = 50     # hub guard: nodes above this degree sit out of wedges
_LP_MIN_COMMON = 1   # propose pairs with ≥ this many common neighbors


def q_link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction over the shared-shingle
    co-occurrence graph: edges join documents sharing ≥
    ``_LP_MIN_SHARED`` distinct (cap-surviving) shingles — a weaker tie
    than the dedup family's Jaccard bar, so the graph keeps OPEN
    wedges — and every distance-2 non-edge (b < c) with ≥
    ``_LP_MIN_COMMON`` common neighbors is proposed with

        jaccard(b, c) = |N(b) ∩ N(c)| / (deg(b) + deg(c) − |N(b) ∩ N(c)|)

    — the classic link-prediction baseline (Liben-Nowell & Kleinberg),
    here surfacing "both overlap the same third documents" candidates
    for a verification pass the blocking joins never scheduled.  (The
    VERIFIED near-dup graph is the wrong substrate: its transitivity
    is ≈1 — see ``dedup_transitivity`` — so it has no open wedges to
    predict into.)

    Scale: edge generation is the house capped-blocking shape (ONE
    groupBy(sh) caps hot shingles AND emits the doc-list whose
    in-array pair expansion is bounded by cap²/2 — the
    ``dedup_ngram_jaccard`` kernel); wedge enumeration is one
    self-join of the hub-capped adjacency (Σ deg² ≤ |V|·cap² after the
    ``_LP_DEG_CAP`` guard — without it one mega-hub puts a deg² wedge
    fan on a single key); existing edges leave via one anti-join.
    Counts are exact integers; only the final Jaccard is rounded.
    """
    sh = _shingles(spark, sf_dir)
    groups = (
        sh.groupBy("sh")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
        .where(F.size("docs") <= _LP_SH_CAP)
    )
    pair_structs = F.flatten(
        F.transform(
            "docs",
            lambda x, i: F.transform(
                F.slice(F.col("docs"), i + F.lit(2), F.size("docs")),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    # e0 and e are each referenced from several downstream branches
    # (deg0, the two anti-joins, adj twice for the wedge self-join, and
    # the non-edge anti-join) — unpersisted, the whole shingle pyramid
    # re-executed per reference (~5x).  Release-tracked persists compute
    # each once; both are edge lists, far smaller than the token table.
    e0 = _q._persist_tracked(
        groups.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= _LP_MIN_SHARED)
        .select("a", "b")
    )
    deg0 = (
        e0.select(F.col("a").alias("v"))
        .unionAll(e0.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    hubs = deg0.where(F.col("d") > _LP_DEG_CAP).select("v")
    e = _q._persist_tracked(
        e0.join(hubs, e0.a == hubs.v, "left_anti")
        .join(hubs, e0.b == hubs.v, "left_anti")
    )
    adj = e.select(F.col("a").alias("v"), F.col("b").alias("nb")).unionAll(
        e.select(F.col("b").alias("v"), F.col("a").alias("nb"))
    )
    deg = adj.groupBy("v").agg(F.count("*").alias("d"))
    x, y = adj.alias("x"), adj.alias("y")
    common = (
        x.join(y, (F.col("x.nb") == F.col("y.nb")) & (F.col("x.v") < F.col("y.v")))
        .groupBy(F.col("x.v").alias("b"), F.col("y.v").alias("c"))
        .agg(F.count("*").cast("bigint").alias("common_neighbors"))
        .where(F.col("common_neighbors") >= _LP_MIN_COMMON)
    )
    non_edges = common.join(
        e, (common.b == e.a) & (common.c == e.b), "left_anti"
    )
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("deg_b"))
    dc = deg.select(F.col("v").alias("c"), F.col("d").alias("deg_c"))
    u = F.col("deg_b") + F.col("deg_c") - F.col("common_neighbors")
    return (
        non_edges.join(db, "b")
        .join(dc, "c")
        .select(
            F.col("b").cast("bigint").alias("doc_a"),
            F.col("c").cast("bigint").alias("doc_b"),
            "common_neighbors",
            F.round(F.col("common_neighbors") / u, 6).alias("jaccard"),
        )
    )


ORACLE_LINK_PREDICTION_JACCARD = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
sh_all AS (
  SELECT DISTINCT doc_id,
         list_extract(l, i) || ' ' || list_extract(l, i+1) || ' ' || list_extract(l, i+2) AS sh
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
        FROM toks WHERE len(l) >= 3)),
sh AS (SELECT doc_id, sh FROM (
         SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS f FROM sh_all)
       WHERE f <= {_LP_SH_CAP}),
e0 AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= {_LP_MIN_SHARED}),
deg0 AS (
  SELECT v, count(*) AS d FROM (
    SELECT a AS v FROM e0 UNION ALL SELECT b AS v FROM e0)
  GROUP BY v),
hubs AS (SELECT v FROM deg0 WHERE d > {_LP_DEG_CAP}),
e AS (
  SELECT * FROM e0
  WHERE a NOT IN (SELECT v FROM hubs) AND b NOT IN (SELECT v FROM hubs)),
adj AS (
  SELECT a AS v, b AS nb FROM e UNION ALL SELECT b AS v, a AS nb FROM e),
deg AS (SELECT v, count(*) AS d FROM adj GROUP BY v),
common AS (
  SELECT x.v AS b, y.v AS c, CAST(count(*) AS BIGINT) AS common_neighbors
  FROM adj x JOIN adj y ON x.nb = y.nb AND x.v < y.v
  GROUP BY x.v, y.v
  HAVING count(*) >= {_LP_MIN_COMMON}),
non_edges AS (
  SELECT cm.* FROM common cm
  WHERE NOT EXISTS (SELECT 1 FROM e
                    WHERE e.a = cm.b AND e.b = cm.c))
SELECT CAST(n.b AS BIGINT) AS doc_a, CAST(n.c AS BIGINT) AS doc_b,
       n.common_neighbors,
       round(CAST(n.common_neighbors AS DOUBLE)
             / (db.d + dc.d - n.common_neighbors), 6) AS jaccard
FROM non_edges n
JOIN deg db ON db.v = n.b
JOIN deg dc ON dc.v = n.c
"""


# ---------------------------------------------------------------------------
# role_balance
# ---------------------------------------------------------------------------


def q_role_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation user/assistant token balance over the
    synthesized transcript table (``_turns``): turn and token counts
    per role plus the assistant token share — the "is anyone actually
    talking back?" shape signal a dialogue-data curator reads next to
    ``turn_take_entropy`` (alternation) and ``adjacent_turn_runs``
    (degeneracy).

    Scale: map-side role/token arithmetic, ONE partial-aggregated
    groupBy(conv_id).  The share is the house half-up micro-division
    over exact integer token counts.
    """
    t = _turns(spark, sf_dir)
    ntoks = F.size(F.split("text", " "))
    is_a = (F.col("role") == "assistant").cast("bigint")
    return (
        t.select("conv_id", is_a.alias("a"), ntoks.alias("nt"))
        .groupBy("conv_id")
        .agg(
            F.count("*").cast("bigint").alias("n_turns"),
            F.sum("a").cast("bigint").alias("assistant_turns"),
            F.sum(F.col("a") * F.col("nt")).cast("bigint").alias(
                "assistant_tokens"
            ),
            F.sum((1 - F.col("a")) * F.col("nt")).cast("bigint").alias(
                "user_tokens"
            ),
        )
        .select(
            "conv_id",
            "n_turns",
            "assistant_turns",
            "assistant_tokens",
            "user_tokens",
            (
                F.expr(
                    "(2000000 * assistant_tokens"
                    " + nullif(assistant_tokens + user_tokens, 0))"
                    " DIV nullif(2 * (assistant_tokens + user_tokens), 0)"
                )
                / F.lit(1000000.0)
            ).alias("assistant_share"),
        )
    )


ORACLE_ROLE_BALANCE = f"""
WITH t AS ({_ORACLE_TURNS}),
g AS (
  SELECT conv_id,
         CAST(count(*) AS BIGINT) AS n_turns,
         CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)
           AS assistant_turns,
         CAST(sum(CASE WHEN role = 'assistant'
                       THEN len(string_split(text, ' ')) ELSE 0 END) AS BIGINT)
           AS assistant_tokens,
         CAST(sum(CASE WHEN role <> 'assistant'
                       THEN len(string_split(text, ' ')) ELSE 0 END) AS BIGINT)
           AS user_tokens
  FROM t GROUP BY conv_id)
SELECT conv_id, n_turns, assistant_turns, assistant_tokens, user_tokens,
       ((2000000 * assistant_tokens
         + nullif(assistant_tokens + user_tokens, 0))
        // nullif(2 * (assistant_tokens + user_tokens), 0))
         / CAST(1000000.0 AS DOUBLE) AS assistant_share
FROM g
"""


# ---------------------------------------------------------------------------
# ngram_topk_coverage
# ---------------------------------------------------------------------------

_COV_KS = (10, 100, 1000)


def q_ngram_topk_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact coverage of the top-k most frequent 3-word shingles at
    k ∈ {10, 100, 1000}: the fraction of ALL shingle occurrences that
    the k highest-count shingles account for — the templatedness curve
    a boilerplate budget is set against (a corpus where k=10 covers
    half the mass is template spam; natural text stays flat).

    Exactness with ties, without ranking the vocabulary: collapse the
    shingle counts to the compressed (count c, multiplicity m)
    histogram (the ``gini_concentration`` trick), order its ≤
    #distinct-count rows descending, prefix-sum shingles and
    occurrences, and take each k's block as
    prev_occ + (min(k, cum_sh) − prev_sh)·c — any k cutting inside a
    tie block takes exactly (k − prev_sh) of its equal-count shingles,
    the same value whichever shingles a ranked version would pick.

    Scale: shingle counts are one partial-agg pass; the histogram is a
    second partial agg to ≤ #distinct-count rows; everything ordered
    runs on that bounded frame.  Integers end-to-end; the coverage is
    the half-up micro-division.
    """
    # persisted: both the histogram and the totals row read the shingle
    # counts, and unpersisted each re-ran the shingle pyramid + groupBy
    sh_occ = _q._persist_tracked(
        _shingles(spark, sf_dir)
        .groupBy("sh")
        .agg(F.count("*").alias("c"))
    )
    hist = sh_occ.groupBy("c").agg(F.count("*").alias("m"))
    w = Window.orderBy(F.col("c").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    blocks = hist.select(
        "c",
        "m",
        F.sum("m").over(w).alias("cum_sh"),
        F.sum(F.col("c") * F.col("m")).over(w).alias("cum_occ"),
    ).select(
        "c",
        (F.col("cum_sh") - F.col("m")).alias("prev_sh"),
        "cum_sh",
        (F.col("cum_occ") - F.col("c") * F.col("m")).alias("prev_occ"),
    )
    tot = sh_occ.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("total_occ"),
        F.count("*").cast("bigint").alias("total_sh"),
    )
    ks = spark.createDataFrame([(k,) for k in _COV_KS], "k int")
    j = ks.crossJoin(F.broadcast(tot)).join(
        F.broadcast(blocks),
        (F.col("prev_sh") < F.col("k"))
        & (
            (F.col("cum_sh") >= F.col("k"))
            | (F.col("cum_sh") == F.col("total_sh"))
        ),
        "left",
    )
    covered = F.col("prev_occ") + (
        F.least(F.col("k").cast("bigint"), F.col("cum_sh")) - F.col("prev_sh")
    ) * F.col("c")
    return (
        j.groupBy("k", "total_occ", "total_sh")
        .agg(F.max(covered).cast("bigint").alias("covered_occ"))
        .select(
            "k",
            F.least(F.col("k").cast("bigint"), F.col("total_sh")).alias(
                "shingles_used"
            ),
            F.coalesce("covered_occ", F.lit(0)).alias("covered_occ"),
            (
                F.expr(
                    "(2000000 * coalesce(covered_occ, 0) + nullif(total_occ, 0))"
                    " DIV nullif(2 * total_occ, 0)"
                )
                / F.lit(1000000.0)
            ).alias("coverage"),
        )
    )


ORACLE_NGRAM_TOPK_COVERAGE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         list_extract(l, i) || ' ' || list_extract(l, i+1) || ' ' || list_extract(l, i+2) AS sh
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
        FROM toks WHERE len(l) >= 3)),
occ AS (SELECT sh, CAST(count(*) AS BIGINT) AS c FROM sh GROUP BY sh),
hist AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM occ GROUP BY c),
blocks AS (
  SELECT c,
         sum(m) OVER (ORDER BY c DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - m AS prev_sh,
         sum(m) OVER (ORDER BY c DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_sh,
         sum(c * m) OVER (ORDER BY c DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - c * m AS prev_occ
  FROM hist),
tot AS (
  SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS total_occ,
         CAST(count(*) AS BIGINT) AS total_sh
  FROM occ),
ks AS (SELECT unnest([{", ".join(str(k) for k in _COV_KS)}]) AS k),
j AS (
  SELECT ks.k, tot.total_occ, tot.total_sh,
         b.prev_occ + (least(CAST(ks.k AS BIGINT), b.cum_sh) - b.prev_sh) * b.c
           AS covered
  FROM ks CROSS JOIN tot
  LEFT JOIN blocks b
    ON b.prev_sh < ks.k
   AND (b.cum_sh >= ks.k OR b.cum_sh = tot.total_sh))
SELECT k,
       least(CAST(k AS BIGINT), total_sh) AS shingles_used,
       CAST(coalesce(max(covered), 0) AS BIGINT) AS covered_occ,
       ((2000000 * coalesce(max(covered), 0) + nullif(total_occ, 0))
        // nullif(2 * total_occ, 0)) / CAST(1000000.0 AS DOUBLE) AS coverage
FROM j
GROUP BY k, total_occ, total_sh
"""


SHAPE_QUERIES = {
    "embedding_norm_audit": q_embedding_norm_audit,
    "clustering_depth": q_clustering_depth,
    "link_prediction_jaccard": q_link_prediction_jaccard,
    "role_balance": q_role_balance,
    "ngram_topk_coverage": q_ngram_topk_coverage,
}

SHAPE_ORACLES = {
    "embedding_norm_audit": ORACLE_EMBEDDING_NORM_AUDIT,
    "clustering_depth": ORACLE_CLUSTERING_DEPTH,
    "link_prediction_jaccard": ORACLE_LINK_PREDICTION_JACCARD,
    "role_balance": ORACLE_ROLE_BALANCE,
    "ngram_topk_coverage": ORACLE_NGRAM_TOPK_COVERAGE,
}

_q.QUERIES.update(SHAPE_QUERIES)
_q.ORACLES.update(SHAPE_ORACLES)
