"""Analytics catalog, round 3 (session 6): operators rounding out the
training-data platform's relational + similarity-join layer —

* ``ts_gapfill`` — calendar gap-fill + forward fill over the events
  table: per-user daily aggregates densified onto the user's full day
  range (``sequence``/``explode``) with the last observed value carried
  forward (``last(..., ignorenulls)``).  The canonical time-series
  densification every metrics warehouse runs before charting or
  as-of joins.
* ``mix_apply_sample`` — APPLIES the mixture plan ``domain_mix_weights``
  computes: deterministic hash-gated downsampling of the documents
  table to a uniform per-language mix (keep iff hash16(doc_id) lands
  under the language's integer permille).  Pure integer arithmetic on
  both engines, so the sample itself — not a statistic of it — is
  value-hash gated.
* ``sorted_neighborhood`` — the classic entity-resolution blocking
  alternative to LSH (Hernandez & Stolfo, SIGMOD 1995): order the
  corpus by a blocking key and emit every pair within a sliding window
  of ``_SN_W`` positions.  The global rank is a DISTRIBUTED two-level
  computation (per-first-char bucket counts -> tiny ordered prefix ->
  within-bucket row_number), never a single-task global window.
* ``vocab_encode`` — frequency-ranked vocabulary assignment (id 0 =
  most frequent token, ties broken lexically) + per-document encoding
  to an id array with OOV -> -1, the tokenizer-adjacent step between
  ``explode_tokens``/``bpe_merges`` and ``pack_sequences``.  Rank uses
  the same two-level distributed shape keyed on (freq, first-char).
* ``jaccard_prefix_filter`` — PPJoin-style prefix-filtered SET
  similarity self-join at exact rational tau = 3/5 (see its docstring).
* ``fuzzy_join_del1`` — deletion-neighborhood STRING similarity
  self-join at Levenshtein <= 1 (SymSpell/FastSS blocking).

House contract (same as queries_transcript / queries_mining): the
Spark plan is the 100 TB design, a DuckDB oracle replays the exact
semantics bit-for-bit, and the module self-registers into
queries.QUERIES / queries.ORACLES on import.

Reference parity: the reference engine (Bodhi42/Occular-ocr) is a
per-document extractor with no corpus-level layer; these are axis-B
net-new operators the north rule's training-data platform needs on top
of the extraction output (SURVEY.md §2, "LLM-data pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import _t

# ---------------------------------------------------------------------------
# ts_gapfill
# ---------------------------------------------------------------------------


def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily event aggregates densified onto the user's full
    [min_day, max_day] calendar, missing days carried forward.

    Scale: the daily aggregate is one partial-agg groupBy; the calendar
    expands from TWO rows per user (min/max) — never from raw events —
    so the explode is O(users x span_days); the left join and the
    forward-fill window both key on user_id (same hash partitioning
    reused across the join and the window — one effective shuffle
    boundary for the densified side).  Per-user window state is the
    day span, bounded by the calendar, not the event count.
    """
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.to_date("ts").alias("day"),
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("value_sum"),
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    cal = span.select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("day")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cal.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
            F.last("value_sum", ignorenulls=True).over(w).alias("value_ff"),
        )
    )


ORACLE_TS_GAPFILL = """
WITH daily AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, CAST(ts AS DATE) AS day,
         count(*) AS n_events, round(sum(value), 6) AS value_sum
  FROM events GROUP BY 1, 2),
span AS (
  SELECT user_id, min(day) AS lo, max(day) AS hi FROM daily GROUP BY 1),
cal AS (
  SELECT user_id,
         CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
  FROM span)
SELECT c.user_id, c.day,
       CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_events,
       last_value(d.value_sum IGNORE NULLS) OVER (
         PARTITION BY c.user_id ORDER BY c.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ff
FROM cal c LEFT JOIN daily d ON d.user_id = c.user_id AND d.day = c.day
"""


# ---------------------------------------------------------------------------
# mix_apply_sample
# ---------------------------------------------------------------------------


def _hash16_expr(dialect: str) -> str:
    """First 16 bits of md5(doc_id) as an integer, by pure string
    arithmetic over the hex alphabet — identical on Spark SQL and
    DuckDB (the ``sample_stratified`` hash, queries.py _sample_sql)."""
    strtype = "STRING" if dialect == "spark" else "VARCHAR"

    def hexv(j: int) -> str:
        return (
            f"(instr('0123456789abcdef', "
            f"substr(md5(CAST(doc_id AS {strtype})), {j}, 1)) - 1)"
        )

    return f"((({hexv(1)} * 16 + {hexv(2)}) * 16 + {hexv(3)}) * 16 + {hexv(4)})"


def q_mix_apply_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic downsample of the documents table to a uniform
    LANGUAGE mixture: lang s keeps permille_s = min(1000,
    (1000 * N) DIV (k * n_s)) of its docs, gated by hash16(doc_id) —
    the APPLY step for the plan ``domain_mix_weights`` prices (keyed
    on lang here because the synthetic corpus is lang-skewed 218/75/73/
    70/64 while source is uniform — the sampler must be seen to DROP).

    Integer permille (BIGINT division, no doubles) makes the kept SET
    itself oracle-equal, not merely its size.  Scale: one partial-agg
    groupBy(lang) prices the plan; the k-row weight table broadcasts
    back onto the scan; the keep decision is map-side arithmetic on the
    row itself — no second shuffle, stable under id renumbering, and
    uncorrelated with insertion order (hash-gated, not modulo-on-id).
    """
    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    totals = counts.groupBy().agg(
        F.sum("n_docs").alias("total"), F.count("*").alias("k")
    )
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "lang",
        F.expr(
            "least(CAST(1000 AS BIGINT), (1000 * total) DIV (k * n_docs))"
        ).alias("permille"),
    )
    return (
        d.join(F.broadcast(weights), "lang")
        .where(F.expr(_hash16_expr("spark")) % 1000 < F.col("permille"))
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "lang")
    )


ORACLE_MIX_APPLY_SAMPLE = f"""
WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
t AS (SELECT sum(n_docs) AS total, count(*) AS k FROM c),
w AS (SELECT c.lang,
             least(1000, (1000 * t.total) // (t.k * c.n_docs)) AS permille
      FROM c, t)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang
FROM documents d JOIN w ON w.lang = d.lang
WHERE {_hash16_expr("duck")} % 1000 < w.permille
"""


# ---------------------------------------------------------------------------
# sorted_neighborhood
# ---------------------------------------------------------------------------

_SN_W = 5        # sliding-window size over the sorted order
_SN_KEY_LEN = 12  # blocking-key prefix length


def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo 1995): order
    documents by a blocking key (first ``_SN_KEY_LEN`` chars of text,
    doc_id tiebreak) and emit every candidate pair within ``_SN_W``
    positions — O(n·w) pairs vs LSH's collision-driven candidates,
    the standard alternative when the match key is a sortable prefix.

    Scale: the global rank is NEVER a single-task ``Window.orderBy``
    over the corpus — it decomposes into (1) per-first-char bucket
    counts (partial-agg, ~alphabet-size rows), (2) one tiny ordered
    prefix-sum window over those bucket rows, (3) row_number within
    each bucket (parallel across buckets; first char of the key IS the
    bucket, so (bucket, key, id) ordering equals (key, id)).  Pair
    expansion is an equi-join on rank+j for j in 1..w-1 — shuffle on
    an integer key, perfectly balanced by construction (ranks are a
    permutation).  The same two-level shape recurses on key prefix
    length if one first-char bucket ever outgrows a task.
    """
    # NULL text coalesces to '' so the c1 equi-join below never drops a
    # row the oracle ranks (and '' sorts first on both engines, whereas
    # NULL orders differ: Spark windows put NULLS FIRST, DuckDB LAST).
    txt = F.coalesce(F.col("text"), F.lit(""))
    t = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.substring(txt, F.lit(1), F.lit(_SN_KEY_LEN)).alias("key"),
        F.substring(txt, F.lit(1), F.lit(1)).alias("c1"),
    )
    bcounts = t.groupBy("c1").agg(F.count("*").alias("n"))
    wb = Window.orderBy("c1").rowsBetween(Window.unboundedPreceding, -1)
    prefix = bcounts.select(
        "c1", F.coalesce(F.sum("n").over(wb), F.lit(0)).alias("p")
    )
    wr = Window.partitionBy("c1").orderBy("key", "doc_id")
    ranked = (
        t.join(F.broadcast(prefix), "c1")
        .select(
            "doc_id",
            (F.col("p") + F.row_number().over(wr)).cast("bigint").alias("rank"),
        )
    )
    offsets = F.explode(
        F.array(*[F.lit(j) for j in range(1, _SN_W)])
    ).alias("j")
    left = ranked.select(
        F.col("doc_id").alias("doc_a"), F.col("rank").alias("rank_a"), offsets
    )
    return (
        left.join(
            ranked.select(F.col("doc_id").alias("doc_b"), F.col("rank")),
            left["rank_a"] + left["j"] == F.col("rank"),
        )
        .select("doc_a", "doc_b", F.col("j").cast("int").alias("dist"))
    )


ORACLE_SORTED_NEIGHBORHOOD = f"""
WITH r AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         row_number() OVER (
           ORDER BY substr(coalesce(text, ''), 1, {_SN_KEY_LEN}), doc_id
         ) AS rank
  FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(b.rank - a.rank AS INT) AS dist
FROM r a JOIN r b ON b.rank - a.rank BETWEEN 1 AND {_SN_W - 1}
"""


# ---------------------------------------------------------------------------
# vocab_encode
# ---------------------------------------------------------------------------

_VOCAB_MIN_FREQ = 3  # frequency threshold that bounds the ranked vocab


def q_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary (id 0 = most frequent, lexical
    tiebreak) applied back to every document as an id array, OOV -> -1
    — the dictionary-encoding step between tokenization and
    ``pack_sequences`` in a pre-training loader.

    Scale: token frequency is one partial-agg groupBy(tok); the
    ``_VOCAB_MIN_FREQ`` threshold bounds the ranked vocabulary (the
    long unigram tail is OOV by design — rank only what you keep).
    The rank itself reuses the sorted_neighborhood two-level shape
    keyed on (freq, first-char): group counts reduce to a tiny ordered
    prefix window, row_number runs per (freq, first-char) group in
    parallel, and (freq DESC, c1, tok) ordering equals the oracle's
    (freq DESC, tok) because c1 is a prefix of tok.  Encoding joins
    exploded tokens to the vocab on tok (broadcast when the vocab fits,
    shuffle-hash otherwise — both sides hash the same key) and
    reassembles per-doc order with array_sort over (pos, id) structs —
    no window over raw token rows.
    """
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "text"
    )
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    ).where(F.col("tok") != "")
    freq = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .where(F.col("freq") >= _VOCAB_MIN_FREQ)
        .withColumn("c1", F.substring("tok", 1, 1))
    )
    gcounts = freq.groupBy("freq", "c1").agg(F.count("*").alias("n"))
    wg = Window.orderBy(F.col("freq").desc(), F.col("c1")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    gprefix = gcounts.select(
        "freq", "c1", F.coalesce(F.sum("n").over(wg), F.lit(0)).alias("p")
    )
    wv = Window.partitionBy("freq", "c1").orderBy("tok")
    vocab = (
        freq.join(F.broadcast(gprefix), ["freq", "c1"])
        .select(
            "tok",
            (F.col("p") + F.row_number().over(wv) - 1)
            .cast("bigint")
            .alias("tok_id"),
        )
    )
    return (
        toks.join(vocab, "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("pos").alias("pos"),
                            F.coalesce("tok_id", F.lit(-1).cast("bigint")).alias(
                                "tid"
                            ),
                        )
                    )
                ),
                lambda s: s["tid"],
            ).alias("ids"),
            F.sum(F.when(F.col("tok_id").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
    )


ORACLE_VOCAB_ENCODE = f"""
WITH spl AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, string_split(text, ' ') AS l
  FROM documents),
toks AS (
  SELECT doc_id, i AS pos, l[i] AS tok
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i FROM spl)
  WHERE l[i] <> ''),
freq AS (
  SELECT tok, count(*) AS freq FROM toks GROUP BY tok
  HAVING count(*) >= {_VOCAB_MIN_FREQ}),
vocab AS (
  SELECT tok,
         CAST(row_number() OVER (ORDER BY freq DESC, tok) - 1 AS BIGINT)
           AS tok_id
  FROM freq)
SELECT t.doc_id,
       list(coalesce(v.tok_id, -1) ORDER BY t.pos) AS ids,
       CAST(sum(CASE WHEN v.tok_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov
FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
GROUP BY t.doc_id
"""


# ---------------------------------------------------------------------------
# jaccard_prefix_filter
# ---------------------------------------------------------------------------

_PPJ_NUM = 3          # Jaccard threshold tau = _PPJ_NUM / _PPJ_DEN (3/5)
_PPJ_DEN = 5
_PPJ_CAP = 100        # document-frequency cap per prefix token


def q_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-similarity self-join with PREFIX FILTERING (Chaudhuri et al.
    ICDE 2006 / PPJoin, Xiao et al. WWW 2008): document pairs whose
    token-set Jaccard >= 3/5, found without comparing all pairs.

    The filter: order every doc's distinct tokens by GLOBAL frequency
    ascending (rarest first, lexical tiebreak); J(A,B) >= t implies
    overlap >= ceil(t*|A|), so any qualifying pair must collide on one
    of each doc's first |A| - ceil(t*|A|) + 1 tokens.  Blocking on the
    prefix (the doc's RAREST tokens) instead of all tokens is the whole
    point — candidate buckets are small by construction, unlike
    ``dedup_ngram_jaccard``'s unfiltered shingle blocking.

    All thresholds are exact integer arithmetic (ceil(3L/5) =
    (3L+4) DIV 5; J >= 3/5 <=> 8*overlap >= 3*(|A|+|B|)), so the pair
    SET is bit-equal across engines — no float boundary cases.

    Cap caveat: buckets larger than ``_PPJ_CAP`` are dropped (hot-key
    guard), so a qualifying pair whose EVERY shared prefix token is
    over-cap is not emitted; the oracle mirrors the cap, so the gate
    pins the capped semantics.  The prefix filter makes over-cap
    prefix tokens rare by construction (prefixes prefer RARE tokens),
    but completeness is exact only modulo that cap.

    Scale: token frequency is one partial-agg groupBy; per-doc rank is
    a window keyed by doc_id (state = tokens-per-doc, bounded);
    candidates reuse the house capped-blocking shape (one groupBy(tok)
    emitting a <= _PPJ_CAP doc-list, pairs expand in-array); the exact
    verify joins candidates back to the token table on each side's
    doc key — cost O(candidates x tokens/doc), the PPJoin verify cost.
    """
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "text"
    )
    toks = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    freq = toks.groupBy("tok").agg(F.count("*").alias("tf"))
    wd = Window.partitionBy("doc_id").orderBy("tf", "tok")
    prefix = (
        toks.join(freq, "tok")
        .join(sizes, "doc_id")
        .withColumn("r", F.row_number().over(wd))
        .where(
            F.col("r")
            <= F.col("sz")
            - F.expr(f"({_PPJ_NUM} * sz + {_PPJ_DEN - 1}) DIV {_PPJ_DEN}")
            + 1
        )
        .select("doc_id", "tok")
    )
    buckets = (
        prefix.groupBy("tok")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
        .where((F.size("docs") >= 2) & (F.size("docs") <= _PPJ_CAP))
    )
    pair_structs = F.flatten(
        F.transform(
            "docs",
            lambda x, i: F.transform(
                F.slice(F.col("docs"), i + F.lit(2), F.size("docs")),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    cands = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .distinct()
    )
    ta = toks.select(F.col("doc_id").alias("doc_a"), "tok")
    tb = toks.select(F.col("doc_id").alias("doc_b"), "tok")
    overlap = (
        cands.join(ta, "doc_a")
        .join(tb, ["doc_b", "tok"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("o"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("la"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("lb"))
    return (
        overlap.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(
            F.lit(_PPJ_NUM + _PPJ_DEN) * F.col("o")
            >= F.lit(_PPJ_NUM) * (F.col("la") + F.col("lb"))
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("o") / (F.col("la") + F.col("lb") - F.col("o")), 6
            ).alias("jaccard"),
        )
    )


ORACLE_JACCARD_PREFIX_FILTER = f"""
WITH spl AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, string_split(text, ' ') AS l
  FROM documents),
toks AS (
  SELECT DISTINCT doc_id, l[i] AS tok
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i FROM spl)
  WHERE l[i] <> ''),
sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
freq AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok),
pref AS (
  SELECT doc_id, tok FROM (
    SELECT t.doc_id, t.tok, s.sz,
           row_number() OVER (PARTITION BY t.doc_id
                              ORDER BY f.tf, t.tok) AS r
    FROM toks t JOIN freq f ON f.tok = t.tok
    JOIN sizes s ON s.doc_id = t.doc_id)
  WHERE r <= sz - (({_PPJ_NUM} * sz + {_PPJ_DEN - 1}) // {_PPJ_DEN}) + 1),
capped AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, tok, count(*) OVER (PARTITION BY tok) AS df FROM pref)
  WHERE df BETWEEN 2 AND {_PPJ_CAP}),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a JOIN capped b ON a.tok = b.tok AND a.doc_id < b.doc_id),
ov AS (
  SELECT c.doc_a, c.doc_b, count(*) AS o
  FROM cands c
  JOIN toks ta ON ta.doc_id = c.doc_a
  JOIN toks tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
  GROUP BY 1, 2)
SELECT ov.doc_a, ov.doc_b,
       round(CAST(ov.o AS DOUBLE) / (sa.sz + sb.sz - ov.o), 6) AS jaccard
FROM ov
JOIN sizes sa ON sa.doc_id = ov.doc_a
JOIN sizes sb ON sb.doc_id = ov.doc_b
WHERE {_PPJ_NUM + _PPJ_DEN} * ov.o >= {_PPJ_NUM} * (sa.sz + sb.sz)
"""


# ---------------------------------------------------------------------------
# fuzzy_join_del1
# ---------------------------------------------------------------------------

_FJ_CAP = 50          # signature-bucket cap (hot-key guard, oracle-mirrored)


def q_fuzzy_join_del1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy self-join (Levenshtein <= 1) over customer
    names via DELETION-NEIGHBORHOOD signatures (the SymSpell / FastSS
    blocking, Bocek et al. 2007): each string emits itself plus every
    single-character deletion; any pair within one edit MUST share a
    signature (substitution at i -> both deletion-at-i sigs equal;
    insert/delete -> the shorter string IS a deletion sig of the
    longer; equality -> identity sig), so the signature scheme itself
    is provably complete, and the exact ``levenshtein`` verify makes
    the result identical to the all-pairs join — EXCEPT for pairs
    whose every shared signature lands in a bucket larger than
    ``_FJ_CAP``: the hot-key cap below deliberately drops those
    buckets (a near-duplicate *flood* on one signature is pathological
    input), so completeness holds only for pairs with at least one
    under-cap shared signature.  The oracle mirrors the cap, so the
    gate pins the capped semantics, not the uncapped ideal.

    Complements ``jaccard_prefix_filter`` (set similarity) with the
    STRING-similarity family over the same capped-blocking house shape.

    Scale: signatures per row = len+1 (bounded, map-side explode);
    candidate generation is ONE groupBy(sig) emitting a <= _FJ_CAP
    doc-list with in-array pair expansion — per-key work is capped, no
    pairwise join, no window; verify cost is O(candidates), each a
    single JVM ``levenshtein`` call.  At corpus scale the signature
    space is near-unique, so buckets stay tiny by construction.
    """
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("id"),
        F.col("c_name").alias("nm"),
    )
    del1 = F.transform(
        F.sequence(F.lit(1), F.length("nm")),
        lambda i: F.concat(
            F.substring(F.col("nm"), F.lit(1), i - 1),
            F.substring(F.col("nm"), i + 1, F.length("nm")),
        ),
    )
    # _spread before the deletion-neighborhood explode (len+1 substring
    # pairs per name — the heavy map stage; single local split
    # otherwise, no-op at scale — guide §2.5).  collect_set dedups ids
    # within each signature, so the r05 shape's separate distinct()
    # exchange before the bucket groupBy is gone — ONE sig-keyed
    # shuffle builds the deduped buckets (guide §2.4).
    buckets = (
        _q._spread(c)
        .select(
            "id",
            F.explode(F.concat(F.array(F.col("nm")), del1)).alias("sig"),
        )
        .groupBy("sig")
        .agg(F.array_sort(F.collect_set("id")).alias("ids"))
        .where((F.size("ids") >= 2) & (F.size("ids") <= _FJ_CAP))
    )
    pair_structs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size("ids")),
                lambda y: F.struct(x.alias("ia"), y.alias("ib")),
            ),
        )
    )
    cands = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.ia").alias("ia"), F.col("p.ib").alias("ib"))
        .distinct()
    )
    na = c.select(F.col("id").alias("ia"), F.col("nm").alias("nm_a"))
    nb = c.select(F.col("id").alias("ib"), F.col("nm").alias("nm_b"))
    return (
        cands.join(na, "ia")
        .join(nb, "ib")
        .withColumn("dist", F.levenshtein("nm_a", "nm_b"))
        .where(F.col("dist") <= 1)
        .select(
            F.col("ia").alias("cust_a"),
            F.col("ib").alias("cust_b"),
            "dist",
        )
    )


ORACLE_FUZZY_JOIN_DEL1 = f"""
WITH s AS (
  SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS nm FROM customer),
sigs AS (
  SELECT id, nm AS sig FROM s
  UNION ALL
  SELECT id, substr(nm, 1, i - 1) || substr(nm, i + 1) AS sig
  FROM (SELECT id, nm, unnest(generate_series(1, length(nm))) AS i FROM s)),
dsig AS (SELECT DISTINCT id, sig FROM sigs),
capped AS (
  SELECT id, sig FROM (
    SELECT id, sig, count(*) OVER (PARTITION BY sig) AS df FROM dsig)
  WHERE df BETWEEN 2 AND {_FJ_CAP}),
cands AS (
  SELECT DISTINCT a.id AS ia, b.id AS ib
  FROM capped a JOIN capped b ON a.sig = b.sig AND a.id < b.id)
SELECT c.ia AS cust_a, c.ib AS cust_b,
       levenshtein(sa.nm, sb.nm) AS dist
FROM cands c
JOIN s sa ON sa.id = c.ia
JOIN s sb ON sb.id = c.ib
WHERE levenshtein(sa.nm, sb.nm) <= 1
"""


# ---------------------------------------------------------------------------
# assoc_rules — basket co-occurrence with support / confidence / lift
# ---------------------------------------------------------------------------

_AR_MIN_SUPPORT = 3  # a rule needs >= 3 supporting baskets


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over event baskets — the market-basket
    classic (support / confidence / lift), with the basket defined as
    one (user, day): which event types co-occur in a user's day, and
    which co-occurrences beat independence (lift > 1)?

    Distinct from ``bigram_pmi`` (sequence ADJACENCY over token
    streams): this is SET co-occurrence under a blocking key, the
    a-priori first pass.  Scale shape:

    1. baskets reduce to distinct (user, day, event_type) — one
       partial-agg pass, events never reappear;
    2. pair candidates generate IN-ARRAY per basket (sorted
       collect_set, then the ordered in-array pairing the dedup family
       uses) — fan-out bounded by |event-type alphabet| choose 2 per
       basket, never by basket count;
    3. pair/single supports are partial-agg counts over an
       alphabet-bounded key space; the basket total rides a 1-row
       broadcast.  Confidence is emitted BOTH directions per unordered
       pair (a->b and b->a share a support row).

    All counts are exact integers; the two ratios round to 6 dp with
    identical expression shape on both engines (always positive, so no
    -0.0 surface).
    """
    e = (
        _q._t(spark, sf_dir, "events")
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.to_date("ts").alias("day"),
            "event_type",
        )
        .distinct()
    )
    n_baskets = (
        e.select("user_id", "day").distinct().agg(F.count("*").alias("nb"))
    )
    singles = e.groupBy("event_type").agg(F.count("*").alias("c_single"))
    basket_sets = e.groupBy("user_id", "day").agg(
        F.array_sort(F.collect_set("event_type")).alias("ts")
    )
    pair_structs = F.flatten(
        F.transform(
            "ts",
            lambda x, i: F.transform(
                F.slice(F.col("ts"), i + F.lit(2), F.size("ts")),
                lambda y: F.struct(x.alias("lo"), y.alias("hi")),
            ),
        )
    )
    pairs = (
        basket_sets.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.lo").alias("lo"), F.col("p.hi").alias("hi"))
        .agg(F.count("*").alias("c_pair"))
        .where(F.col("c_pair") >= _AR_MIN_SUPPORT)
    )
    both = pairs.unionByName(
        pairs.select(
            F.col("hi").alias("lo"), F.col("lo").alias("hi"), "c_pair"
        )
    )
    sa = singles.select(F.col("event_type").alias("lo"), F.col("c_single").alias("c_a"))
    sb = singles.select(F.col("event_type").alias("hi"), F.col("c_single").alias("c_b"))
    return (
        both.join(F.broadcast(sa), "lo")
        .join(F.broadcast(sb), "hi")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            F.col("lo").alias("ante"),
            F.col("hi").alias("cons"),
            F.col("c_pair").cast("bigint").alias("support"),
            F.round(F.col("c_pair") / F.col("c_a"), 6).alias("confidence"),
            F.round(
                F.col("c_pair").cast("double")
                * F.col("nb")
                / (F.col("c_a").cast("double") * F.col("c_b")),
                6,
            ).alias("lift"),
        )
    )


ORACLE_ASSOC_RULES = f"""
WITH e AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type FROM events),
nb AS (SELECT count(*) AS nb FROM (SELECT DISTINCT user_id, day FROM e)),
singles AS (SELECT event_type, count(*) AS c_single FROM e GROUP BY 1),
pairs AS (
  SELECT a.event_type AS lo, b.event_type AS hi, count(*) AS c_pair
  FROM e a JOIN e b
    ON a.user_id = b.user_id AND a.day = b.day
   AND a.event_type < b.event_type
  GROUP BY 1, 2
  HAVING count(*) >= {_AR_MIN_SUPPORT}),
bidir AS (
  SELECT lo, hi, c_pair FROM pairs
  UNION ALL
  SELECT hi, lo, c_pair FROM pairs)
SELECT p.lo AS ante, p.hi AS cons,
       CAST(p.c_pair AS BIGINT) AS support,
       round(CAST(p.c_pair AS DOUBLE) / sa.c_single, 6) AS confidence,
       round(CAST(p.c_pair AS DOUBLE) * n.nb
             / (CAST(sa.c_single AS DOUBLE) * sb.c_single), 6) AS lift
FROM bidir p
JOIN singles sa ON sa.event_type = p.lo
JOIN singles sb ON sb.event_type = p.hi, nb n
"""


# ---------------------------------------------------------------------------
# quantile_normalize — per-source quantile normalization to the global
# distribution (exact integer ranks end-to-end)
# ---------------------------------------------------------------------------


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalize ``n_chars`` across sources: each document's
    value is replaced by the GLOBAL value at the same within-source
    quantile — the cross-batch distribution-alignment step (classic in
    omics, equally applicable to aligning per-crawl length/quality
    scores before a single global threshold is applied).

    Semantics, all exact integers:

        q_d = (2·r − 1) / (2·n_s)            (midpoint quantile in source)
        k_d = ceil(q_d · N)                   (target global rank)
        normalized = value at global rank k_d

    Scale: BOTH rank sides are the score_deciles two-level rank.  The
    within-source side uses (source, value) as the first level —
    source cardinality is fixed by the corpus model, so a window
    partitioned solely by source funnels n/|sources| rows through one
    task's sort (VERDICT r5 "What's wrong" #1): per-(source, value)
    counts, one prefix window over the bounded compressed frame,
    parallel within-(source, value) row_number.  The global side is
    the same shape keyed by value alone.  The mapping is then ONE hash
    equi-join on the integer rank (k = g) — no range join, no global
    per-row window, no floats anywhere (k_d's ceil is pure BIGINT:
    (num + den − 1) DIV den; exact while 2·r·N < 2^63 — past ~10^9
    rows per side, normalize on a quantile grid instead of per-rank).
    """
    # persisted: five branches (both rank sides, n_s, total, vcounts)
    # read this projection — unpersisted, five separate corpus scans
    t = _q._persist_tracked(
        _t(spark, sf_dir, "documents").select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "source",
            F.col("n_chars").cast("bigint").alias("v"),
        )
    )
    svcounts = t.groupBy("source", "v").agg(F.count("*").alias("sc"))
    wsv = Window.partitionBy("source").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sprefix = svcounts.select(
        "source", "v",
        F.coalesce(F.sum("sc").over(wsv), F.lit(0)).alias("sp"),
    )
    wsr = Window.partitionBy("source", "v").orderBy("doc_id")
    src = t.join(F.broadcast(sprefix), ["source", "v"]).withColumn(
        "r", (F.col("sp") + F.row_number().over(wsr)).cast("bigint")
    ).drop("sp")
    n_s = t.groupBy("source").agg(F.count("*").alias("n_s"))
    total = t.agg(F.count("*").alias("n"))
    # global rank table: the score_deciles two-level decomposition
    vcounts = t.groupBy("v").agg(F.count("*").alias("c"))
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    prefix = vcounts.select(
        "v", F.coalesce(F.sum("c").over(wv), F.lit(0)).alias("p")
    )
    wr = Window.partitionBy("v").orderBy("doc_id")
    g = (
        t.join(F.broadcast(prefix), "v")
        .select(
            F.col("v").alias("g_v"),
            (F.col("p") + F.row_number().over(wr)).alias("g"),
        )
    )
    keyed = (
        src.join(F.broadcast(n_s), "source")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "k",
            F.expr("((2 * r - 1) * n + 2 * n_s - 1) DIV (2 * n_s)"),
        )
    )
    return keyed.join(g, F.col("k") == F.col("g")).select(
        "doc_id",
        "source",
        F.col("v").alias("n_chars"),
        F.col("r").alias("src_rank"),
        F.col("k").alias("global_rank"),
        F.col("g_v").alias("normalized"),
    )


ORACLE_QUANTILE_NORMALIZE = """
WITH t AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS v FROM documents),
src AS (
  SELECT doc_id, source, v,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY v, doc_id) AS BIGINT) AS r,
         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_s
  FROM t),
g AS (
  SELECT v AS g_v,
         CAST(row_number() OVER (ORDER BY v, doc_id) AS BIGINT) AS g
  FROM t),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t)
SELECT src.doc_id, src.source, src.v AS n_chars,
       src.r AS src_rank,
       ((2 * src.r - 1) * n.n + 2 * src.n_s - 1) // (2 * src.n_s)
         AS global_rank,
       g.g_v AS normalized
FROM src CROSS JOIN n
JOIN g ON g.g = ((2 * src.r - 1) * n.n + 2 * src.n_s - 1) // (2 * src.n_s)
"""


# ---------------------------------------------------------------------------
# attribution_last_touch — conversion attribution over the event stream
# ---------------------------------------------------------------------------

_ATTR_TOUCHES = ("click", "view")
_ATTR_WINDOW_US = 7 * 86400 * 1_000_000  # 7-day lookback, microseconds


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each ``purchase`` is credited
    to the user's most recent preceding ``click``/``view`` within a
    7-day lookback; purchases with no in-window touch credit
    ``'none'`` — the rollup every growth dashboard starts from (and
    the event-stream sibling of ``sessionize``).

    The carried-forward touch is ``last(touch, ignorenulls) OVER
    (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED
    PRECEDING)`` — touch type and touch time null out together on
    non-touch rows, so the two carries stay consistent; event_id
    breaks timestamp ties identically on both engines.  The lookback
    compares exact microsecond integers (``unix_micros`` /
    ``epoch_us``); purchase values roll up in half-up-rounded integer
    cents, so no float ever accumulates.

    Scale: ONE shuffle on user_id (per-user activity is bounded — the
    sessionize contract), then a bounded-key partial agg to ≤ 3 rows.
    The event table is scanned once; nothing is collected.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    ).where(F.col("event_type").isin(*_ATTR_TOUCHES, "purchase"))
    is_touch = F.col("event_type").isin(*_ATTR_TOUCHES)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev.select(
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(
            F.when(is_touch, F.unix_micros(F.col("ts").cast("timestamp"))),
            ignorenulls=True
        )
        .over(w)
        .alias("touch_us"),
    )
    conv = carried.where(F.col("event_type") == "purchase").select(
        F.when(
            F.col("touch_us").isNotNull()
            & (F.col("us") - F.col("touch_us") <= _ATTR_WINDOW_US),
            F.col("touch_type"),
        )
        .otherwise(F.lit("none"))
        .alias("touch_type"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    agg = conv.groupBy("touch_type").agg(
        F.count("*").cast("bigint").alias("n_conversions"),
        F.sum("cents").cast("bigint").alias("value_cents"),
    )
    tot = agg.groupBy().agg(F.sum("n_conversions").alias("n_tot"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "touch_type",
        "n_conversions",
        "value_cents",
        # house half-up integer share in micro-units
        (
            F.expr("(2000000 * n_conversions + n_tot) DIV (2 * n_tot)")
            / 1000000.0
        ).alias("share"),
    )


_ATTR_TOUCH_SQL = "('" + "', '".join(_ATTR_TOUCHES) + "')"

ORACLE_ATTRIBUTION_LAST_TOUCH = f"""
WITH ev AS (
  SELECT user_id, ts, event_id, event_type, value
  FROM events
  WHERE event_type IN {_ATTR_TOUCH_SQL} OR event_type = 'purchase'),
carried AS (
  SELECT event_type, value, epoch_us(ts) AS us,
         last_value(CASE WHEN event_type IN {_ATTR_TOUCH_SQL}
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS touch_type,
         last_value(CASE WHEN event_type IN {_ATTR_TOUCH_SQL}
                         THEN epoch_us(ts) END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS touch_us
  FROM ev),
conv AS (
  SELECT CASE WHEN touch_us IS NOT NULL
                   AND us - touch_us <= {_ATTR_WINDOW_US}
              THEN touch_type ELSE 'none' END AS touch_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM carried WHERE event_type = 'purchase'),
agg AS (
  SELECT touch_type,
         CAST(count(*) AS BIGINT) AS n_conversions,
         CAST(sum(cents) AS BIGINT) AS value_cents
  FROM conv GROUP BY touch_type),
tot AS (SELECT sum(n_conversions) AS n_tot FROM agg)
SELECT touch_type, n_conversions, value_cents,
       ((2000000 * n_conversions + n_tot) // (2 * n_tot)) / 1000000.0
         AS share
FROM agg, tot
"""


# ---------------------------------------------------------------------------
# containment_join — asymmetric set-containment self-join
# ---------------------------------------------------------------------------

_CJ_NUM = 4           # containment threshold tau = _CJ_NUM / _CJ_DEN (4/5)
_CJ_DEN = 5
_CJ_CAP = 100         # postings-list cap per blocking token (hot-key guard)


def q_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC set-containment self-join: directed pairs (a, b),
    a ≠ b, with C(a→b) = |S(a) ∩ S(b)| / |S(a)| >= 4/5 over DISTINCT
    3-WORD SHINGLES (the minhash family's blocking unit — unigrams on
    a small-vocabulary corpus are all hot and the postings cap would
    silence the join; shingle space grows with vocab³ so dfs stay low
    at every SF) — "at least 4/5 of a's shingles appear in b".  This is the
    quote-inclusion / subset-near-dup detector the symmetric Jaccard
    entries structurally miss: a short doc embedded in a long one has
    tiny Jaccard but containment ≈ 1.

    Blocking is the DIRECTIONAL prefix filter: C >= t implies overlap
    >= ceil(t·|A|), so doc a must share one of its first
    |A| − ceil(t·|A|) + 1 rarest tokens (global-frequency order,
    lexical tiebreak) with b — but b contributes ALL its tokens (a
    superset has no prefix bound), i.e. candidates = prefix(a) ⋈
    postings(b).  Hot postings lists are capped at ``_CJ_CAP`` (the
    LSH band-cap discipline) and the oracle mirrors the cap, so the
    gate pins the capped semantics; prefixes prefer rare tokens, so
    over-cap blocking tokens are rare by construction.

    Thresholds are exact integers (ceil(4L/5) = (4L+4) DIV 5;
    C >= 4/5 <=> 5·o >= 4·|A|), so the pair set is bit-equal across
    engines; the containment value is one IEEE division rounded at
    the surface.

    Scale: same capped-blocking shape as ``jaccard_prefix_filter``
    (bounded buckets, in-array pair expansion, verify joins on the
    token table) with the one structural difference — the index side
    is full postings, which is why the cap matters MORE here and is
    load-bearing, not cosmetic.
    """
    toks = _q._persist_tracked(
        _q._shingles(spark, sf_dir).select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("sh").alias("tok"),
        )
    )
    # ONE groupBy(tok) serves both the global-frequency table (tf, for
    # the rarest-prefix order) and the postings lists — the r05 shape
    # shuffled the full token table by tok twice for them (guide §2.4:
    # two operations keyed the same way share one exchange).
    by_tok = _q._persist_tracked(
        toks.groupBy("tok").agg(
            F.count("*").alias("tf"),
            F.array_sort(F.collect_list("doc_id")).alias("docs"),
        )
    )
    # |S(a)| comes from an unordered window over the SAME doc_id
    # partitioning the row_number pass already establishes — the r05
    # shape paid a separate groupBy(doc_id) + join for it.
    wd = Window.partitionBy("doc_id").orderBy("tf", "tok")
    prefix = (
        toks.join(by_tok.select("tok", "tf"), "tok")
        .withColumn("r", F.row_number().over(wd))
        .withColumn("sz", F.count("*").over(Window.partitionBy("doc_id")))
        .where(
            F.col("r")
            <= F.col("sz")
            - F.expr(f"({_CJ_NUM} * sz + {_CJ_DEN - 1}) DIV {_CJ_DEN}")
            + 1
        )
        .select(F.col("doc_id").alias("doc_a"), "tok")
    )
    postings = by_tok.where(F.size("docs") <= _CJ_CAP).select("tok", "docs")
    cands = (
        prefix.join(postings, "tok")
        .select("doc_a", F.explode("docs").alias("doc_b"))
        .where(F.col("doc_a") != F.col("doc_b"))
        .distinct()
    )
    # Verify via per-doc sorted shingle-set arrays + map-side
    # array_intersect: the r05 shape expanded every candidate pair by
    # doc_a's full token list and shuffled that widest-of-all
    # intermediate by (doc_b, tok) before a count groupBy; here only
    # the candidate PAIRS move, each picking up two bounded-length
    # arrays (one exchange per side), and the overlap count never
    # crosses the wire at all.  toks is distinct per (doc_id, sh), so
    # |array_intersect| is exactly the join-count the oracle computes.
    arrs = _q._persist_tracked(
        toks.groupBy("doc_id").agg(
            F.collect_list("tok").alias("tl"), F.count("*").alias("sz")
        )
    )
    return (
        cands.join(
            arrs.select(
                F.col("doc_id").alias("doc_a"),
                F.col("tl").alias("la"),
                F.col("sz").alias("sza"),
            ),
            "doc_a",
        )
        .join(
            arrs.select(
                F.col("doc_id").alias("doc_b"), F.col("tl").alias("lb")
            ),
            "doc_b",
        )
        .withColumn("o", F.size(F.array_intersect("la", "lb")).cast("long"))
        .where(F.lit(_CJ_DEN) * F.col("o") >= F.lit(_CJ_NUM) * F.col("sza"))
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("o") / F.col("sza"), 6).alias("containment"),
        )
    )


ORACLE_CONTAINMENT_JOIN = f"""
WITH spl AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, string_split(text, ' ') AS l
  FROM documents),
toks AS (
  SELECT DISTINCT doc_id,
         l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS tok
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
        FROM spl WHERE len(l) >= 3)),
sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
freq AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok),
pref AS (
  SELECT doc_id AS doc_a, tok FROM (
    SELECT t.doc_id, t.tok, s.sz,
           row_number() OVER (PARTITION BY t.doc_id
                              ORDER BY f.tf, t.tok) AS r
    FROM toks t JOIN freq f ON f.tok = t.tok
    JOIN sizes s ON s.doc_id = t.doc_id)
  WHERE r <= sz - (({_CJ_NUM} * sz + {_CJ_DEN - 1}) // {_CJ_DEN}) + 1),
capped AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, tok, count(*) OVER (PARTITION BY tok) AS df FROM toks)
  WHERE df <= {_CJ_CAP}),
cands AS (
  SELECT DISTINCT p.doc_a, c.doc_id AS doc_b
  FROM pref p JOIN capped c ON c.tok = p.tok AND c.doc_id <> p.doc_a),
ov AS (
  SELECT c.doc_a, c.doc_b, count(*) AS o
  FROM cands c
  JOIN toks ta ON ta.doc_id = c.doc_a
  JOIN toks tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
  GROUP BY 1, 2)
SELECT ov.doc_a, ov.doc_b,
       round(CAST(ov.o AS DOUBLE) / sa.sz, 6) AS containment
FROM ov JOIN sizes sa ON sa.doc_id = ov.doc_a
WHERE {_CJ_DEN} * ov.o >= {_CJ_NUM} * sa.sz
"""


# ---------------------------------------------------------------------------
# event_markov — first-order event-type transition matrix
# ---------------------------------------------------------------------------


def q_event_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream: for
    each (from_type, to_type) pair, the count of consecutive
    same-user transitions and the MLE row probability — the behavior
    model behind next-action prediction and anomaly scoring (an
    error→error loop shows up as a hot diagonal cell).

    Ordering is (ts, event_id) per user, so timestamp ties cannot
    reorder across engines; row probabilities use the house half-up
    integer division in micro-units (the langid_confusion share rule),
    so every surfaced number is exact.

    Scale: one shuffle on user_id for the lead() window (per-user
    activity bounded — the sessionize contract), then a bounded-key
    partial agg over the ≤ |event_types|² cells with row totals as a
    rollup of the cells, never a second pass.
    """
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cells = (
        ev.withColumn("to_type", F.lead("event_type").over(w))
        .where(F.col("to_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"), F.col("to_type")
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    rowtot = cells.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return cells.join(F.broadcast(rowtot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        (
            F.expr("(2000000 * n + row_n) DIV (2 * row_n)") / 1000000.0
        ).alias("p"),
    )


ORACLE_EVENT_MARKOV = """
WITH trans AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events),
cells AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM trans WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type),
rowtot AS (SELECT from_type, sum(n) AS row_n FROM cells GROUP BY from_type)
SELECT from_type, to_type, n,
       ((2000000 * n + row_n) // (2 * row_n)) / 1000000.0 AS p
FROM cells JOIN rowtot USING (from_type)
"""


# ---------------------------------------------------------------------------
# user_burstiness — Fano factor of per-user daily activity
# ---------------------------------------------------------------------------


def q_user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user burstiness of daily activity: the Fano factor
    F = Var(x)/mean(x) over the user's ACTIVE days (population
    variance; inactive days are not zero-filled — both engines pin
    the same convention).  F ≈ 1 is Poisson-like usage, F ≫ 1 is
    bursty (binge sessions), F < 1 is metronomic — the
    bot-vs-human-cadence feature every abuse model starts with.

    With d active days, S = Σx and Q = Σx² exact integers,
    F = (d·Q − S²)/(d·S) — numerator and denominator exact
    (DECIMAL(38,0) promoted), one IEEE division rounded to 6.

    Scale: two-level partial agg (user, day) → user — zero windows,
    zero joins; output is |users| rows.
    """
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("x"))
    )
    agg = daily.groupBy("user_id").agg(
        F.count("*").cast("decimal(38,0)").alias("d"),
        F.sum("x").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("q"),
    )
    return agg.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("d").cast("bigint").alias("n_days"),
        F.col("s").cast("bigint").alias("n_events"),
        F.round(
            (F.col("d") * F.col("q") - F.col("s") * F.col("s")).cast("double")
            / (F.col("d") * F.col("s")).cast("double"),
            6,
        ).alias("fano"),
    )


ORACLE_USER_BURSTINESS = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2),
agg AS (
  SELECT user_id,
         CAST(count(*) AS DECIMAL(38,0)) AS d,
         CAST(sum(x) AS DECIMAL(38,0)) AS s,
         CAST(sum(x * x) AS DECIMAL(38,0)) AS q
  FROM daily GROUP BY user_id)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(d AS BIGINT) AS n_days,
       CAST(s AS BIGINT) AS n_events,
       round(CAST(d * q - s * s AS DOUBLE) / CAST(d * s AS DOUBLE), 6)
         AS fano
FROM agg
"""


ANALYTICS_QUERIES = {
    "assoc_rules": q_assoc_rules,
    "ts_gapfill": q_ts_gapfill,
    "mix_apply_sample": q_mix_apply_sample,
    "sorted_neighborhood": q_sorted_neighborhood,
    "vocab_encode": q_vocab_encode,
    "jaccard_prefix_filter": q_jaccard_prefix_filter,
    "fuzzy_join_del1": q_fuzzy_join_del1,
    "quantile_normalize": q_quantile_normalize,
    "attribution_last_touch": q_attribution_last_touch,
    "containment_join": q_containment_join,
    "event_markov": q_event_markov,
    "user_burstiness": q_user_burstiness,
}

ANALYTICS_ORACLES = {
    "assoc_rules": ORACLE_ASSOC_RULES,
    "ts_gapfill": ORACLE_TS_GAPFILL,
    "mix_apply_sample": ORACLE_MIX_APPLY_SAMPLE,
    "sorted_neighborhood": ORACLE_SORTED_NEIGHBORHOOD,
    "vocab_encode": ORACLE_VOCAB_ENCODE,
    "jaccard_prefix_filter": ORACLE_JACCARD_PREFIX_FILTER,
    "fuzzy_join_del1": ORACLE_FUZZY_JOIN_DEL1,
    "quantile_normalize": ORACLE_QUANTILE_NORMALIZE,
    "attribution_last_touch": ORACLE_ATTRIBUTION_LAST_TOUCH,
    "containment_join": ORACLE_CONTAINMENT_JOIN,
    "event_markov": ORACLE_EVENT_MARKOV,
    "user_burstiness": ORACLE_USER_BURSTINESS,
}

_q.QUERIES.update(ANALYTICS_QUERIES)
_q.ORACLES.update(ANALYTICS_ORACLES)
