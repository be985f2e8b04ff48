"""Corpus-curation catalog, round 3 (session 3): span-level exact
deduplication (the token-window formulation of Lee et al.,
"Deduplicating Training Data Makes Language Models Better" — the
scalable MapReduce variant of their suffix-array method), the C4-style
scrub that actually rewrites documents, corpus-unigram language-model
scoring, and a Gopher-style staged quality funnel with integer-exact
thresholds.

House contract throughout: the Spark plan is the 100 TB design
(map-side window generation, digest shuffle keys, partial aggregation,
no driver-side loops) and a DuckDB oracle replays the exact semantics
for the value-hash gate.  Self-registers into queries.QUERIES /
queries.ORACLES on import (same pattern as queries_ext /
queries_pipeline / queries_scale).

Reference parity: the reference engine's per-page text cleanup
(postprocess.py block filters) is per-document; these entries are the
CROSS-document curation stage a 10^12-turn corpus needs before
training, built from the same primitives (tokenize, hash, group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import queries as _q
from .queries import _t

# ---------------------------------------------------------------------------
# Span-level exact duplication (Lee et al. token windows)
# ---------------------------------------------------------------------------

_SPAN_K = 8  # tokens per window: long enough that natural re-use is rare,
             # short enough that injected near-dups share many windows


def _span_window_hashes(d: DataFrame) -> DataFrame:
    """(doc_id, i, win_h): every _SPAN_K-token window of every document,
    keyed by its md5 digest.

    Window generation is IN-ARRAY (transform over sequence) then a
    single posexplode — pure map-side expansion, no shuffle, no Python.
    The 128-bit digest replaces the ~50-byte window string as the
    shuffle key: collision-safe and 3× fewer shuffle bytes, the knob
    that matters when the window count is ~n_tokens × corpus size.
    Guard: a doc with fewer than _SPAN_K tokens yields zero windows
    (sequence(1, n-k+1) would DESCEND for n < k — same ANSI trap as
    bigram_pmi).

    The scan is repartitioned to the session parallelism FIRST: the
    fixture parquet is a single split, and the O(n_tokens × k) window
    expansion is the expensive map side — on one task it serializes the
    whole job (the house 1-split pitfall).  Keyed on doc_id so the
    downstream per-doc aggregations reuse the clustering.
    """
    d = d.repartition(
        d.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    wins = F.when(
        n >= _SPAN_K,
        F.transform(
            F.sequence(F.lit(1), n - _SPAN_K + 1),
            lambda i: F.md5(F.array_join(F.slice(toks, i, F.lit(_SPAN_K)), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return d.select(
        "doc_id", F.posexplode(wins).alias("pos0", "win_h")
    ).select("doc_id", (F.col("pos0") + 1).alias("i"), "win_h")


def q_dup_span_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-duplication audit: for every document, how many of its
    _SPAN_K-token windows also occur in at least one OTHER document —
    the contamination metric a curation pipeline watches before and
    after scrubbing.

    Plan: map-side window digests -> one partial-aggregated groupBy
    (win_h) for document frequency -> equi-join back on the digest ->
    per-doc partial-agg counts.  Both shuffles key on the digest /
    doc_id; nothing is quadratic and no window string travels through
    an exchange.  At 100 TB a hot boilerplate window ("click here to
    unsubscribe ...") makes df huge but the join stays 1 row per
    occurrence — df is a scalar per digest, not a pair list, so there
    is no hot-key blowup to cap (contrast dedup_ngram_jaccard, which
    materializes PAIRS and therefore caps).
    """
    d = _t(spark, sf_dir, "documents")
    # persisted: the df rollup and the join back both read the window
    # hashes — unpersisted each re-ran the rolling digest pass
    w = _q._persist_tracked(_span_window_hashes(d))
    wf = w.groupBy("win_h").agg(F.countDistinct("doc_id").alias("df"))
    per_doc = (
        w.join(wf, "win_h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.sum(F.when(F.col("df") > 1, 1).otherwise(0)).alias(
                "n_dup_windows"
            ),
        )
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.when(
                F.coalesce("n_windows", F.lit(0)) > 0,
                F.round(
                    F.col("n_dup_windows") / F.col("n_windows"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_ratio"),
        )
    )


ORACLE_DUP_SPAN_REPORT = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
w AS (SELECT doc_id, array_to_string(t[i:i + {_SPAN_K - 1}], ' ') AS win
      FROM toks, unnest(range(1, greatest(len(t) - {_SPAN_K} + 2, 1))) AS r(i)),
f AS (SELECT win, count(DISTINCT doc_id) AS df FROM w GROUP BY win),
p AS (SELECT w.doc_id, count(*) AS nw,
             count(*) FILTER (WHERE f.df > 1) AS nd
      FROM w JOIN f USING (win) GROUP BY w.doc_id)
SELECT d.doc_id,
       coalesce(p.nw, 0) AS n_windows,
       coalesce(p.nd, 0) AS n_dup_windows,
       CASE WHEN coalesce(p.nw, 0) > 0
            THEN round(CAST(p.nd AS DOUBLE) / CAST(p.nw AS DOUBLE), 6)
            ELSE 0.0 END AS dup_ratio
FROM documents d LEFT JOIN p USING (doc_id)
"""


def q_scrub_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4/Lee scrub itself: rewrite every document with the tokens
    covered by cross-document duplicated windows REMOVED, keeping each
    duplicated span only in its canonical owner (the smallest doc_id
    containing the window).  Within-document repeats are untouched —
    the rule is cross-document, exactly C4's "span occurring in more
    than one document".

    Plan: window digests -> groupBy(win_h) keeps only df > 1 digests
    with their min-doc owner (partial-aggregated; the filtered side is
    a vanishing fraction of windows) -> join back marks offending
    window STARTS -> in-array sequence explodes starts to covered
    token positions (map-side, ≤ k rows per bad window) -> left_anti
    against the posexploded tokens -> per-doc ordered reassembly
    (collect_list + array_sort, within-group only, never a global
    sort).  Every shuffle keys on the digest or doc_id; the rewrite is
    embarrassingly parallel per document.
    """
    d = _t(spark, sf_dir, "documents")
    # repartition ONCE here so the token explode and the n_tokens scan
    # parallelize too; the helper's internal repartition on the same key
    # collapses into this one (CollapseRepartition)
    d = d.repartition(
        d.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )
    # persisted: both the duplicate-digest rollup and the bad-position
    # join read the window hashes — unpersisted each re-ran the rolling
    # digest pass
    w = _q._persist_tracked(_span_window_hashes(d))
    dup = (
        w.groupBy("win_h")
        .agg(
            F.min("doc_id").alias("owner"),
            F.countDistinct("doc_id").alias("df"),
        )
        .where(F.col("df") > 1)
    )
    bad_pos = (
        w.join(dup, "win_h")
        .where(F.col("doc_id") != F.col("owner"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + _SPAN_K - 1)
            ).alias("p"),
        )
        .distinct()
    )
    tok = (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok"))
        .select("doc_id", (F.col("pos0") + 1).alias("p"), "tok")
    )
    clean = (
        tok.join(bad_pos, ["doc_id", "p"], "left_anti")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("p", "tok"))).alias("a"))
        .select(
            "doc_id",
            F.size("a").alias("n_kept"),
            F.array_join(F.transform("a", lambda x: x["tok"]), " ").alias(
                "clean_text"
            ),
        )
    )
    return (
        d.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
        .join(clean, "doc_id", "left")
        .select(
            "doc_id",
            (
                F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))
            ).cast("bigint").alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


ORACLE_SCRUB_DUP_SPANS = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
w AS (SELECT doc_id, i, array_to_string(t[i:i + {_SPAN_K - 1}], ' ') AS win
      FROM toks, unnest(range(1, greatest(len(t) - {_SPAN_K} + 2, 1))) AS r(i)),
dup AS (SELECT win, min(doc_id) AS owner
        FROM w GROUP BY win HAVING count(DISTINCT doc_id) > 1),
bad AS (SELECT DISTINCT w.doc_id, w.i + o.off AS p
        FROM w JOIN dup USING (win),
             unnest(range(0, {_SPAN_K})) AS o(off)
        WHERE w.doc_id <> dup.owner),
tok AS (SELECT doc_id, p, t[p] AS tok
        FROM toks, unnest(range(1, len(t) + 1)) AS rp(p)),
kept AS (SELECT doc_id, p, tok FROM tok ANTI JOIN bad USING (doc_id, p)),
agg AS (SELECT doc_id, count(*) AS n_kept,
               string_agg(tok, ' ' ORDER BY p) AS clean_text
        FROM kept GROUP BY doc_id)
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) - coalesce(a.n_kept, 0) AS BIGINT)
         AS n_removed,
       coalesce(a.clean_text, '') AS clean_text
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Corpus-unigram language-model scoring
# ---------------------------------------------------------------------------


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean log2-probability under the corpus's own
    unigram LM — the cheap perplexity proxy curation pipelines use to
    rank documents for filtering / curriculum mixing (CCNet's LM
    score, one model class down).

    Plan: one explode -> partial-aggregated vocab count -> the vocab
    (O(|V|), tiny next to the corpus) BROADCASTS back onto the token
    stream, as does the 1-row total — so the scoring pass itself is
    map-side.  What shuffles: the vocab build's token-keyed exchange
    (map-combined partials, O(|V| x partitions) rows) and the 1-row
    total; the per-doc mean adds NO exchange — it reuses the doc_id
    repartition already in place.  At 100 TB a web-scale
    vocab still fits executor memory after minimum-count pruning; if
    it didn't, the broadcast degrades to a shuffle join on the token
    key with the same semantics.  Scores round to 6 dp: both engines
    compute log2 on identical doubles (exact integer ratios), leaving
    only sub-ulp libm/summation-order noise far below the rounding
    quantum.
    """
    d = _t(spark, sf_dir, "documents")
    # same 1-split-fixture fix as _span_window_hashes: the token explode
    # is the heavy map side and must not run on a single input split
    d = d.repartition(
        d.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n_total"))
    return (
        tok.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(F.log2(F.col("cnt") / F.col("n_total"))), 6
            ).alias("logprob2"),
        )
    )


ORACLE_UNIGRAM_LOGPROB = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             FROM documents),
vocab AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM vocab)
SELECT doc_id,
       count(*) AS n_tokens,
       round(avg(log2(CAST(cnt AS DOUBLE) / CAST(n_total AS DOUBLE))), 6)
         AS logprob2
FROM tok JOIN vocab USING (tok) CROSS JOIN tot
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Gopher-style staged quality funnel
# ---------------------------------------------------------------------------

_FUNNEL_STOPWORDS = ("the", "a")


def q_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged quality-filter funnel (Gopher rules, adapted to the
    corpus): how many documents survive each cumulative gate —
    min-token-count, stopword floor, type/token ratio, mean word
    length.  The shape every curation run reports before committing a
    filter config.

    Every threshold is INTEGER-EXACT (cross-multiplied: stop_cnt*50 >=
    n instead of stop_cnt/n >= 0.02), so the gate booleans — and hence
    the funnel counts — carry zero floating-point risk on either
    engine.  Plan: one map-side pass computes all per-doc features, a
    single partial-aggregated conditional-sum collapses to one row,
    and an in-array explode unpivots to the 5-row funnel — exactly one
    job, no shuffle wider than 1 row.
    """
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    stop_cnt = F.size(
        F.filter(toks, lambda x: x.isin(*_FUNNEL_STOPWORDS))
    )
    dist_cnt = F.size(F.array_distinct(toks))
    chars = F.length("text") - n + 1  # total chars inside words
    m = d.select(
        n.alias("n"),
        stop_cnt.alias("sc"),
        dist_cnt.alias("dc"),
        chars.alias("ch"),
    )
    c1 = F.col("n") >= 20
    c2 = F.col("sc") * 50 >= F.col("n")
    c3 = F.col("dc") * 5 >= F.col("n") * 2
    c4 = (F.col("ch") >= F.col("n") * 4) & (F.col("ch") <= F.col("n") * 6)

    def npass(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    a = m.agg(
        F.count("*").cast("bigint").alias("t0"),
        npass(c1).alias("t1"),
        npass(c1 & c2).alias("t2"),
        npass(c1 & c2 & c3).alias("t3"),
        npass(c1 & c2 & c3 & c4).alias("t4"),
    )
    stages = F.array(
        F.struct(F.lit("0_total").alias("stage"), F.col("t0").alias("n_pass")),
        F.struct(F.lit("1_min_tokens").alias("stage"), F.col("t1").alias("n_pass")),
        F.struct(F.lit("2_stopword_floor").alias("stage"), F.col("t2").alias("n_pass")),
        F.struct(F.lit("3_type_token_ratio").alias("stage"), F.col("t3").alias("n_pass")),
        F.struct(F.lit("4_mean_word_len").alias("stage"), F.col("t4").alias("n_pass")),
    )
    return a.select(F.explode(stages).alias("s")).select("s.stage", "s.n_pass")


ORACLE_QUALITY_FUNNEL = """
WITH m AS (
  SELECT len(string_split(text, ' ')) AS n,
         len(list_filter(string_split(text, ' '),
                         x -> x IN ('the', 'a'))) AS sc,
         len(list_distinct(string_split(text, ' '))) AS dc,
         length(text) - len(string_split(text, ' ')) + 1 AS ch
  FROM documents),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS t0,
         CAST(sum(CASE WHEN n >= 20 THEN 1 ELSE 0 END) AS BIGINT) AS t1,
         CAST(sum(CASE WHEN n >= 20 AND sc * 50 >= n
                       THEN 1 ELSE 0 END) AS BIGINT) AS t2,
         CAST(sum(CASE WHEN n >= 20 AND sc * 50 >= n AND dc * 5 >= n * 2
                       THEN 1 ELSE 0 END) AS BIGINT) AS t3,
         CAST(sum(CASE WHEN n >= 20 AND sc * 50 >= n AND dc * 5 >= n * 2
                        AND ch >= n * 4 AND ch <= n * 6
                       THEN 1 ELSE 0 END) AS BIGINT) AS t4
  FROM m)
SELECT '0_total' AS stage, t0 AS n_pass FROM a
UNION ALL SELECT '1_min_tokens', t1 FROM a
UNION ALL SELECT '2_stopword_floor', t2 FROM a
UNION ALL SELECT '3_type_token_ratio', t3 FROM a
UNION ALL SELECT '4_mean_word_len', t4 FROM a
"""


# ---------------------------------------------------------------------------
# Content-defined chunking (rolling-hash cut points)
# ---------------------------------------------------------------------------

_CDC_P = 64  # cut when window-hash % P == 0 -> expected chunk ~P chars


def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking: split every document at positions
    where the 8-char rolling base-31 polynomial (the doc_fingerprint
    hash, exact in int64) is ≡ 0 mod _CDC_P — the cut rule dedup
    storage systems (LBFS/rsync lineage) use so that an insertion
    early in a document shifts at most one chunk boundary, unlike
    fixed-stride chunking where every downstream chunk changes.

    Cut rule: window starting at 1-based offset i covers chars
    [i, i+7]; h(i) % P == 0 cuts BEFORE offset i+8, provided the new
    chunk would be non-empty (i+8 <= n).  Documents shorter than the
    window yield one whole-document chunk; empty documents yield none.
    Production refinements (min/max chunk clamps) are config on the
    same kernel.

    Plan: the hash is one integer ``np.correlate`` per document inside
    ``mapInPandas`` (dense-math doctrine, SURVEY §4 — the per-offset
    Catalyst form was measured at ~30 interpreted nodes/char on
    doc_fingerprint), chunks are emitted 1->N IN-BATCH (the
    multimodal_frames shape) — zero shuffle, map-side only.  The
    repartition unlocks the 1-split fixture parquet.
    """
    import pandas as pd

    d = _t(spark, sf_dir, "documents")
    d = d.repartition(
        d.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )
    from .queries import _FP_BASE, _FP_WINDOW
    import numpy as np

    W, P = _FP_WINDOW, _CDC_P
    weights = [int(_FP_BASE**j) for j in range(W)]

    def chunker(batches):
        wts = np.array(weights, dtype="int64")
        for pdf in batches:
            out = {
                "doc_id": [],
                "chunk_idx": [],
                "start": [],
                "chunk_len": [],
                "chunk": [],
            }
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                t = t or ""
                n = len(t)
                if n == 0:
                    continue
                b = t.encode("utf-8")
                if len(b) == n:  # pure ASCII: bytes ARE the codes
                    codes = np.frombuffer(b, dtype="uint8").astype("int64")
                else:
                    codes = np.array([ord(c) for c in t], dtype="int64")
                starts = [1]
                if n >= W:
                    h = np.correlate(codes, wts)  # offset i-1 (0-based)
                    cuts = np.nonzero(h % P == 0)[0] + 1 + W  # s = i + W
                    starts += [int(s) for s in cuts if s <= n]
                for idx, s in enumerate(starts):
                    e = (starts[idx + 1] - 1) if idx + 1 < len(starts) else n
                    out["doc_id"].append(doc_id)
                    out["chunk_idx"].append(idx)
                    out["start"].append(s)
                    out["chunk_len"].append(e - s + 1)
                    out["chunk"].append(t[s - 1 : e])
            yield pd.DataFrame(out)

    # _spread: the Python chunking kernel otherwise inherits the
    # scan's single local split (no-op at scale — guide §2.5)
    return _q._spread(d.select("doc_id", "text")).mapInPandas(
        chunker,
        "doc_id bigint, chunk_idx bigint, start bigint, "
        "chunk_len bigint, chunk string",
    )


def _cdc_terms() -> str:
    from .queries import _FP_BASE, _FP_WINDOW

    return " + ".join(
        f"ascii(substring(text, i + {j}, 1)) * CAST({_FP_BASE**j} AS BIGINT)"
        for j in range(_FP_WINDOW)
    )


def _oracle_cdc() -> str:
    from .queries import _FP_WINDOW as W

    return f"""
WITH docs AS (SELECT doc_id, text, length(text) AS n FROM documents),
offs AS (SELECT doc_id, text, n,
                unnest(range(1, greatest(n - {W} + 2, 1))) AS i
         FROM docs),
cuts AS (SELECT doc_id, i + {W} AS s
         FROM offs
         WHERE ({_cdc_terms()}) % {_CDC_P} = 0 AND i + {W} <= n),
starts AS (SELECT doc_id, CAST(1 AS BIGINT) AS s FROM docs WHERE n > 0
           UNION ALL SELECT doc_id, s FROM cuts),
ord AS (SELECT doc_id, s,
               row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1
                 AS chunk_idx,
               lead(s) OVER (PARTITION BY doc_id ORDER BY s) AS nxt
        FROM starts)
SELECT o.doc_id, o.chunk_idx, o.s AS start,
       coalesce(o.nxt, d.n + 1) - o.s AS chunk_len,
       substring(d.text, CAST(o.s AS INT),
                 CAST(coalesce(o.nxt, d.n + 1) - o.s AS INT)) AS chunk
FROM ord o JOIN docs d USING (doc_id)
"""


# ---------------------------------------------------------------------------
# pareto_frontier — 2D skyline selection without a self-join (wave 9)
# ---------------------------------------------------------------------------


def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal document selection on two quality axes — the
    multi-objective "keep the frontier" pass a curation pipeline runs
    when no single score orders the corpus (here: maximize length
    ``n_chars`` AND lexical variety, the distinct-word ratio in integer
    basis points — anti-correlated axes, so the frontier is a real
    curve, not a corner).  A document is kept iff no other document is
    >= on both axes and > on at least one.

    The naive plan is an O(n²) dominance self-join.  The scale shape
    used here is the classic 2D-skyline sweep, distributed with the
    house value-level decomposition — NO self-join, NO global sort of
    row data:

    1. per-d1-value max of d2 (partial agg; at most |distinct d1|
       rows, bounded by the value range, not the corpus);
    2. one ordered prefix-max window over those value rows, d1 DESC,
       strictly-preceding frame -> M(d1) = best d2 among all docs with
       strictly larger d1 (the only ordered structure, value-sized);
    3. broadcast-join back: keep rows with d2 == m(d1) (not beaten at
       their own d1) and d2 > M(d1) (not beaten from above).  Ties on
       both axes stay on the frontier (neither strictly dominates).
    """
    # d2 in integer basis points (x10000, integer division): exact on
    # both engines, no float ratio anywhere in the dominance test
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("d1"),
        F.expr(
            "CAST(size(array_distinct(split(text, ' '))) * 10000"
            " DIV size(split(text, ' ')) AS INT)"
        ).alias("d2"),
    )
    from pyspark.sql import Window

    m = d.groupBy("d1").agg(F.max("d2").alias("m"))
    wv = Window.orderBy(F.col("d1").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    levels = m.select(
        "d1", "m", F.coalesce(F.max("m").over(wv), F.lit(-1)).alias("above")
    )
    return (
        d.join(F.broadcast(levels), "d1")
        .where((F.col("d2") == F.col("m")) & (F.col("d2") > F.col("above")))
        .select(
            "doc_id",
            F.col("d1").alias("n_chars"),
            F.col("d2").alias("variety_bp"),
        )
    )


ORACLE_PARETO_FRONTIER = """
WITH m AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS d1,
         CAST(length(list_distinct(string_split(text, ' '))) * 10000
              // length(string_split(text, ' ')) AS INT) AS d2
  FROM documents)
SELECT a.doc_id, a.d1 AS n_chars, a.d2 AS variety_bp
FROM m a
WHERE NOT EXISTS (
  SELECT 1 FROM m b
  WHERE b.d1 >= a.d1 AND b.d2 >= a.d2 AND (b.d1 > a.d1 OR b.d2 > a.d2))
"""


# ---------------------------------------------------------------------------
# k_anonymity — quasi-identifier group-size / diversity audit
# ---------------------------------------------------------------------------

_KA_K = 10  # k-anonymity threshold
_KA_L = 2  # l-diversity threshold on the sensitive attribute
_KA_BUCKET_W = 400  # n_chars quasi-identifier bucket width
_KA_BUCKET_CAP = 4


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the release-candidate
    corpus: group by the quasi-identifier tuple (lang, length bucket)
    and report, per group, its size, the diversity of the sensitive
    attribute (source), and whether it clears k = _KA_K and l = _KA_L —
    the governance report a privacy review reads before a derived
    dataset ships (groups under k re-identify; groups with one
    sensitive value leak it to everyone in the group).

    Scale: one partial-agg groupBy over the bounded QI key space; the
    sensitive-diversity count is the standard two-level exact distinct
    (distinct (QI, source) pairs first, then counts) — mergeable,
    never a per-group set buffer.  All-integer surfaces.
    """
    d = _t(spark, sf_dir, "documents").select(
        "lang",
        F.expr(
            f"least(CAST(n_chars AS BIGINT) DIV {_KA_BUCKET_W},"
            f" {_KA_BUCKET_CAP})"
        ).alias("len_bucket"),
        "source",
    )
    sizes = d.groupBy("lang", "len_bucket").agg(
        F.count("*").cast("bigint").alias("n")
    )
    div = (
        d.select("lang", "len_bucket", "source")
        .distinct()
        .groupBy("lang", "len_bucket")
        .agg(F.count("*").cast("bigint").alias("n_sensitive"))
    )
    return sizes.join(div, ["lang", "len_bucket"]).select(
        "lang",
        "len_bucket",
        "n",
        "n_sensitive",
        (F.col("n") >= _KA_K).alias("k_ok"),
        (F.col("n_sensitive") >= _KA_L).alias("l_ok"),
    )


ORACLE_K_ANONYMITY = f"""
WITH d AS (
  SELECT lang,
         least(CAST(n_chars AS BIGINT) // {_KA_BUCKET_W}, {_KA_BUCKET_CAP})
           AS len_bucket,
         source
  FROM documents),
sizes AS (
  SELECT lang, len_bucket, CAST(count(*) AS BIGINT) AS n
  FROM d GROUP BY lang, len_bucket),
div AS (
  SELECT lang, len_bucket, CAST(count(*) AS BIGINT) AS n_sensitive
  FROM (SELECT DISTINCT lang, len_bucket, source FROM d)
  GROUP BY lang, len_bucket)
SELECT sizes.lang, sizes.len_bucket, n, n_sensitive,
       n >= {_KA_K} AS k_ok,
       n_sensitive >= {_KA_L} AS l_ok
FROM sizes JOIN div USING (lang, len_bucket)
"""


# ---------------------------------------------------------------------------
# dp_noisy_counts — Laplace-mechanism counts with portable seeded noise
# ---------------------------------------------------------------------------

_DP_EPS_X10 = 10  # epsilon = 1.0, carried as an exact integer literal


def _dp_hash16(dialect: str) -> str:
    """First 16 bits of md5(source || ':dp') via hex-alphabet string
    arithmetic — the portable hash family of bootstrap_ci /
    mix_apply_sample, keyed on the group so each count draws an
    independent noise variate."""

    def hexv(j: int) -> str:
        return (
            f"(instr('0123456789abcdef', substr(md5("
            f"source || ':dp'"
            f"), {j}, 1)) - 1)"
        )

    return f"((({hexv(1)} * 16 + {hexv(2)}) * 16 + {hexv(3)}) * 16 + {hexv(4)})"


def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private per-source document counts: the Laplace
    mechanism at sensitivity 1, epsilon = 1.0 — the release format a
    privacy-budgeted corpus report uses for group-by counts.  Noise is
    inverse-CDF Laplace driven by the house PORTABLE HASH (first 16
    md5 bits of the group key), so the draw is deterministic,
    reproducible, and identical on both engines:

        u = (h + 1/2) / 65536 ∈ (0, 1);  v = u − 1/2
        noise = −(1/eps) · sign(v) · ln(1 − 2|v|)

    The ln argument is an exact dyadic rational from an exact integer,
    the surface rounds to 6 (the house ln-determinism contract shared
    with token_entropy / zipf_fit).  The gate surface ALSO carries the
    true count to pin the mechanism end-to-end; a production release
    would emit only the noisy column — see the docstring's
    pin-vs-release note.

    Scale: one bounded-key partial agg; the noise is a map-side
    expression on the ≤ |sources| aggregate rows.  Zero extra passes,
    zero collects, and the privacy budget is per-release, not
    per-partition (noise attaches AFTER the global count).
    """
    eps = _DP_EPS_X10 / 10.0
    agg = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_true"))
    )
    h = F.expr(_dp_hash16("spark"))
    u = (h + F.lit(0.5)) / F.lit(65536.0)
    v = u - F.lit(0.5)
    noise = (
        -F.lit(1.0 / eps)
        * F.signum(v)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(v))
    )
    return agg.select(
        "source",
        "n_true",
        F.lit(eps).alias("epsilon"),
        F.round(noise, 6).alias("noise"),
        F.round(F.col("n_true") + noise, 6).alias("n_noisy"),
    )


ORACLE_DP_NOISY_COUNTS = f"""
WITH agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_true
  FROM documents GROUP BY source),
noised AS (
  SELECT source, n_true,
         (({_dp_hash16("duckdb")}) + 0.5) / 65536.0 - 0.5 AS v
  FROM agg)
SELECT source, n_true,
       CAST({_DP_EPS_X10 / 10.0} AS DOUBLE) AS epsilon,
       round(-(1.0 / {_DP_EPS_X10 / 10.0}) * sign(v)
             * ln(1.0 - 2.0 * abs(v)), 6) AS noise,
       round(n_true + (-(1.0 / {_DP_EPS_X10 / 10.0}) * sign(v)
                       * ln(1.0 - 2.0 * abs(v))), 6) AS n_noisy
FROM noised
"""


# ---------------------------------------------------------------------------
# kwic_snippets — keyword-in-context extraction
# ---------------------------------------------------------------------------

_KWIC_TERMS = ("spark", "shuffle", "broadcast")
_KWIC_RADIUS = 24  # context characters on each side of the hit


def q_kwic_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context extraction: for each watchlist term, the
    ±24-char window around its FIRST occurrence per document — the
    human-review surface a curation console shows next to every
    blocklist / contamination hit (``domain_blocklist`` flags the doc;
    this shows the reviewer WHY).

    Pure 1-indexed string arithmetic (locate / substr / greatest) with
    identical semantics in both dialects; the snippet start clamps at
    1 and substr past end-of-string truncates the same way on both
    engines.  First-occurrence only, so output is ≤ |docs|·|terms|.

    Scale: 100% map-side — scan, per-term locate, filter hits; no
    shuffle at all (the watchlist is a constant expression, not even a
    broadcast).  At 100 TB this is the embarrassingly-parallel grep.
    """
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text")
    )
    hits = d.select(
        "doc_id",
        "text",
        F.explode(
            F.array(*[F.lit(t) for t in _KWIC_TERMS])
        ).alias("term"),
    ).withColumn("pos", F.expr("locate(term, text)"))
    return (
        hits.where(F.col("pos") > 0)
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "term",
            F.col("pos").cast("int").alias("pos"),
            F.expr(
                f"substr(text, greatest(1, pos - {_KWIC_RADIUS}),"
                f" pos - greatest(1, pos - {_KWIC_RADIUS})"
                f" + length(term) + {_KWIC_RADIUS})"
            ).alias("snippet"),
        )
    )


_KWIC_TERMS_SQL = "('" + "', '".join(_KWIC_TERMS) + "')"

ORACLE_KWIC_SNIPPETS = f"""
WITH hits AS (
  SELECT doc_id, coalesce(text, '') AS text, term,
         instr(coalesce(text, ''), term) AS pos
  FROM documents
  CROSS JOIN (SELECT unnest(ARRAY{list(_KWIC_TERMS)}) AS term))
SELECT CAST(doc_id AS BIGINT) AS doc_id, term, CAST(pos AS INT) AS pos,
       substr(text, greatest(1, pos - {_KWIC_RADIUS}),
              pos - greatest(1, pos - {_KWIC_RADIUS})
              + length(term) + {_KWIC_RADIUS}) AS snippet
FROM hits WHERE pos > 0
"""


CURATION_QUERIES = {
    "pareto_frontier": q_pareto_frontier,
    "dup_span_report": q_dup_span_report,
    "scrub_dup_spans": q_scrub_dup_spans,
    "unigram_logprob": q_unigram_logprob,
    "quality_funnel": q_quality_funnel,
    "cdc_chunks": q_cdc_chunks,
    "k_anonymity": q_k_anonymity,
    "dp_noisy_counts": q_dp_noisy_counts,
    "kwic_snippets": q_kwic_snippets,
}

CURATION_ORACLES = {
    "pareto_frontier": ORACLE_PARETO_FRONTIER,
    "dup_span_report": ORACLE_DUP_SPAN_REPORT,
    "scrub_dup_spans": ORACLE_SCRUB_DUP_SPANS,
    "unigram_logprob": ORACLE_UNIGRAM_LOGPROB,
    "quality_funnel": ORACLE_QUALITY_FUNNEL,
    "cdc_chunks": _oracle_cdc(),
    "k_anonymity": ORACLE_K_ANONYMITY,
    "dp_noisy_counts": ORACLE_DP_NOISY_COUNTS,
    "kwic_snippets": ORACLE_KWIC_SNIPPETS,
}

_q.QUERIES.update(CURATION_QUERIES)
_q.ORACLES.update(CURATION_ORACLES)
