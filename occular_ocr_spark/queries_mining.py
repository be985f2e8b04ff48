"""Mining catalog, round 3 (session 5): three operators a web-scale
training-data platform runs beside the extraction engine —

* ``winnow_fingerprints`` — MOSS-style winnowing (Schleimer, Wilkerson,
  Aiken, SIGMOD 2003): per document, the set of k-gram rolling hashes
  selected as window minima (rightmost-min tie rule).  The guarantee —
  any shared substring of length >= k + w - 1 yields at least one
  shared fingerprint — is what plagiarism / near-dup span detection at
  corpus scale is built on; this is the selection-algorithm sibling of
  ``doc_fingerprint`` (global min only) and ``dup_span_report`` (all
  spans, no selection).
* ``scd2_dimension`` — slowly-changing-dimension type-2 build over the
  events table: change detection + effective-from/to intervals +
  is-current flag, the standard warehouse versioned-dimension op (and
  the lineage shape the north rule's snapshot columns come from).
* ``semdedup`` — SemDeDup-style semantic dedup (Abbas et al., 2023):
  cluster embeddings with the shared IVF coarse quantizer, compare
  pairs only WITHIN a cluster, and drop every vector that has an
  earlier (lower vec_id) same-cluster neighbor above the cosine
  threshold.  The keep rule here is the deterministic pairwise-earlier
  variant (drop v iff exists u < v with cos(u, v) >= tau), not the
  sequential greedy chain — documented, order-stable, and exactly
  SQL-expressible, which makes the whole operator value-hash gated.

House contract (same as queries_transcript / queries_curation): the
Spark plan is the 100 TB design, a DuckDB oracle replays the exact
semantics bit-for-bit, and the module self-registers into
queries.QUERIES / queries.ORACLES on import.

Reference parity: the reference engine (Bodhi42/Occular-ocr) is a
per-document extractor with no corpus-level layer; these are axis-B
net-new operators the north rule's training-data platform needs on top
of the extraction output (SURVEY.md §2, "LLM-data pipeline ops").
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import queries as _q
from .queries import (
    _FP_BASE,
    _IVF_ASSIGN_SQL,
    _embedding_dim,
    _ivf_assignment,
    _subbucketed_pair_cosines,
    _t,
)

# ---------------------------------------------------------------------------
# winnow_fingerprints
# ---------------------------------------------------------------------------
#
# k-gram hash: the same base-31 polynomial as doc_fingerprint
# (queries.py _FP_TERMS), reduced mod a prime so the position tag fits:
#   comb = (poly_hash % _W_MOD) * _W_POS + (_W_POS - 1 - i)
# min(comb) over a window == (min hash, rightmost position among ties)
# — the winnowing tie rule — because a LARGER 1-based position i makes
# the low bits SMALLER.  _W_POS = 2^21 bounds documents at 2M chars; at
# corpus scale longer payloads go through chunk_documents first (the
# bench max is 577 chars).

_W_K = 8            # k-gram length (shared with doc_fingerprint)
_W_W = 8            # winnowing window: guarantee length t = k + w - 1 = 15
_W_MOD = 1073741789  # largest prime < 2^30
_W_POS = 1 << 21

_W_TERMS = " + ".join(
    f"ascii(substr(text, i + {j}, 1)) * CAST({_FP_BASE ** j} AS BIGINT)"
    for j in range(_W_K)
)


def _winnow_select(comb: "np.ndarray", w: int) -> "np.ndarray":
    """Distinct window-minima of ``comb`` over every run of
    ``min(w, len)`` consecutive entries — exact winnowing selection,
    vectorized (property-tested against the naive per-window scan in
    tests/test_mining.py)."""
    ws = min(w, len(comb))
    if ws == 0:
        return comb[:0]
    mins = np.lib.stride_tricks.sliding_window_view(comb, ws).min(axis=1)
    return np.unique(mins)


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection per document, reduced to a
    gate-stable row: (doc_id, n_fp, fp_digest) where fp_digest is the
    md5 of the comma-joined ascending selected values (position-tagged
    hashes), so the gate verifies the exact selected SET, not a count.

    Scale: pure map-side — one ``mapInPandas`` pass over the scan, the
    whole rolling-hash + window-min selection vectorized in numpy per
    Arrow batch (the dense-math doctrine: an unrolled per-position
    Catalyst expression executes interpreted, see _ivf_assignment), and
    ZERO shuffles: selection and digest are per-document, so no
    groupBy is needed at any corpus size.  Downstream (not this entry)
    the fingerprints feed the same capped bucket-join used by
    dedup_ngram_jaccard.
    """
    d = _t(spark, sf_dir, "documents")
    weights = np.array([_FP_BASE ** j for j in range(_W_K)], dtype="int64")

    def winnow(batches):
        for pdf in batches:
            n_fp = np.zeros(len(pdf), dtype="int32")
            digests = []
            for r, t in enumerate(pdf["text"]):
                t = t or ""
                b = t.encode("utf-8")
                if len(b) == len(t):  # pure ASCII: bytes ARE the codes
                    codes = np.frombuffer(b, dtype="uint8").astype("int64")
                else:
                    codes = np.array([ord(c) for c in t], dtype="int64")
                if len(codes) < _W_K:
                    digests.append(hashlib.md5(b"").hexdigest())
                    continue
                poly = np.correlate(codes, weights)  # exact int64, per offset
                pos = np.arange(1, len(poly) + 1, dtype="int64")  # 1-based
                comb = (poly % _W_MOD) * _W_POS + (_W_POS - 1 - pos)
                sel = _winnow_select(comb, _W_W)
                n_fp[r] = len(sel)
                digests.append(
                    hashlib.md5(",".join(str(v) for v in sel).encode()).hexdigest()
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_fp": n_fp, "fp_digest": digests}
            )

    # _spread: the Python winnowing kernel otherwise inherits the
    # scan's single local split (no-op at scale — guide §2.5)
    return _q._spread(d.select("doc_id", "text")).mapInPandas(
        winnow, "doc_id bigint, n_fp int, fp_digest string"
    )


ORACLE_WINNOW_FINGERPRINTS = f"""
WITH pos AS (
  SELECT doc_id,
         text,
         unnest(generate_series(1, length(text) - {_W_K - 1})) AS i
  FROM documents
  WHERE length(coalesce(text, '')) >= {_W_K}),
h AS (
  SELECT doc_id, i,
         (({_W_TERMS}) % {_W_MOD}) * {_W_POS}
           + ({_W_POS} - 1 - i) AS comb
  FROM pos),
nh AS (
  SELECT doc_id, max(i) AS nh, least({_W_W}, max(i)) AS ws
  FROM h GROUP BY doc_id),
ends AS (
  SELECT doc_id, ws, unnest(generate_series(ws, nh)) AS j
  FROM nh),
sel AS (
  SELECT DISTINCT e.doc_id, win.comb
  FROM ends e
  JOIN LATERAL (
    SELECT min(h.comb) AS comb
    FROM h
    WHERE h.doc_id = e.doc_id AND h.i BETWEEN e.j - e.ws + 1 AND e.j
  ) win ON TRUE),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS INT) AS n_fp,
         md5(string_agg(CAST(comb AS VARCHAR), ',' ORDER BY comb)) AS fp_digest
  FROM sel GROUP BY doc_id)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       coalesce(a.n_fp, 0) AS n_fp,
       coalesce(a.fp_digest, md5('')) AS fp_digest
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
"""


# ---------------------------------------------------------------------------
# winnow_matches
# ---------------------------------------------------------------------------

_WM_CAP = 100          # document-frequency cap per fingerprint hash
_WM_MIN_SHARED = 2     # pairs must share >= this many selected hashes


def q_winnow_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document winnowing matches — the join the fingerprints
    exist FOR (MOSS): pairs of documents sharing >= 2 selected k-gram
    hashes (positions stripped), i.e. likely shared spans of length
    >= k + w - 1.

    Scale: the same capped-blocking shape as dedup_ngram_jaccard — the
    per-hash doc-list groupBy both applies the document-frequency cap
    (a boilerplate hash colliding across the corpus must not put a
    |bucket|² expansion on one task) and expands pairs IN-ARRAY
    (bounded by cap²/2 per hash), so there is exactly one shuffle on
    the hash and one on the pair key; the fingerprint generation
    itself is the zero-shuffle winnowing kernel.
    """
    d = _t(spark, sf_dir, "documents")
    weights = np.array([_FP_BASE ** j for j in range(_W_K)], dtype="int64")

    def hashes(batches):
        for pdf in batches:
            ids, khs = [], []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                t = t or ""
                b = t.encode("utf-8")
                if len(b) == len(t):
                    codes = np.frombuffer(b, dtype="uint8").astype("int64")
                else:
                    codes = np.array([ord(c) for c in t], dtype="int64")
                if len(codes) < _W_K:
                    continue
                poly = np.correlate(codes, weights)
                pos = np.arange(1, len(poly) + 1, dtype="int64")
                comb = (poly % _W_MOD) * _W_POS + (_W_POS - 1 - pos)
                kh = np.unique(_winnow_select(comb, _W_W) // _W_POS)
                ids.append(np.full(len(kh), doc_id, dtype="int64"))
                khs.append(kh)
            if ids:
                yield pd.DataFrame(
                    {"doc_id": np.concatenate(ids), "khash": np.concatenate(khs)}
                )

    # _spread: same single-split winnowing-kernel fix as
    # winnow_fingerprints above
    fp = _q._spread(d.select("doc_id", "text")).mapInPandas(
        hashes, "doc_id bigint, khash bigint"
    )
    groups = (
        fp.groupBy("khash")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
        .where((F.size("docs") >= 2) & (F.size("docs") <= _WM_CAP))
    )
    # docs sorted ascending: later elements as partner -> each unordered
    # pair exactly once with doc_a < doc_b (dedup_ngram_jaccard pattern)
    pair_structs = F.flatten(
        F.transform(
            "docs",
            lambda x, i: F.transform(
                F.slice(F.col("docs"), i + F.lit(2), F.size("docs")),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        groups.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= _WM_MIN_SHARED)
    )


ORACLE_WINNOW_MATCHES = f"""
WITH pos AS (
  SELECT doc_id, text,
         unnest(generate_series(1, length(text) - {_W_K - 1})) AS i
  FROM documents
  WHERE length(coalesce(text, '')) >= {_W_K}),
h AS (
  SELECT doc_id, i,
         (({_W_TERMS}) % {_W_MOD}) * {_W_POS}
           + ({_W_POS} - 1 - i) AS comb
  FROM pos),
nh AS (
  SELECT doc_id, max(i) AS nh, least({_W_W}, max(i)) AS ws
  FROM h GROUP BY doc_id),
ends AS (
  SELECT doc_id, ws, unnest(generate_series(ws, nh)) AS j
  FROM nh),
sel AS (
  SELECT DISTINCT e.doc_id, win.comb // {_W_POS} AS khash
  FROM ends e
  JOIN LATERAL (
    SELECT min(h.comb) AS comb
    FROM h
    WHERE h.doc_id = e.doc_id AND h.i BETWEEN e.j - e.ws + 1 AND e.j
  ) win ON TRUE),
capped AS (
  SELECT doc_id, khash FROM (
    SELECT doc_id, khash, count(*) OVER (PARTITION BY khash) AS df
    FROM sel)
  WHERE df BETWEEN 2 AND {_WM_CAP})
SELECT CAST(a.doc_id AS BIGINT) AS doc_a,
       CAST(b.doc_id AS BIGINT) AS doc_b,
       count(*) AS n_shared
FROM capped a JOIN capped b
  ON a.khash = b.khash AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {_WM_MIN_SHARED}
"""


# ---------------------------------------------------------------------------
# scd2_dimension
# ---------------------------------------------------------------------------

def q_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: per user, each run of a
    constant ``event_type`` becomes one versioned dimension row with
    [eff_from_us, eff_to_us) validity, version number, and is_current.

    Scale: ONE shuffle — hash-partition by user_id for the first
    window (change detection via lag); the second window (lead +
    row_number over the filtered change rows) reuses the SAME
    partitioning, so Catalyst plans no second exchange, only a re-sort
    of the (much smaller) change set.  Per-partition memory is one
    user's events in sort order, never the whole table.  Ties on ts
    break on event_id, making the build deterministic under any
    partitioning — the property that lets a nightly SCD2 rebuild be
    idempotently MERGEd into the dimension table.
    """
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    chg = e.withColumn("prev_type", F.lag("event_type").over(w)).where(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    return chg.select(
        "user_id",
        "event_type",
        F.row_number().over(w).cast("int").alias("version"),
        F.col("ts_us").alias("eff_from_us"),
        F.lead("ts_us").over(w).alias("eff_to_us"),
        F.lead("ts_us").over(w).isNull().alias("is_current"),
    )


ORACLE_SCD2_DIMENSION = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
  FROM events),
chg AS (
  SELECT *
  FROM (SELECT user_id, event_type, ts_us, event_id,
               lag(event_type) OVER w AS prev_type
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
  WHERE prev_type IS NULL OR prev_type <> event_type)
SELECT user_id, event_type,
       CAST(row_number() OVER w AS INT) AS version,
       ts_us AS eff_from_us,
       lead(ts_us) OVER w AS eff_to_us,
       lead(ts_us) OVER w IS NULL AS is_current
FROM chg WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
"""


# ---------------------------------------------------------------------------
# semdedup
# ---------------------------------------------------------------------------

_SEM_THRESH = 0.6  # higher bar than dedup_embed_cosine's 0.4 pair report


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style cluster-local semantic dedup: every vector gets a
    keep/drop verdict — drop v iff some u with u.vec_id < v.vec_id in
    the SAME IVF cluster has round(cos(u, v), 6) >= 0.6.

    Scale: identical skeleton to ``dedup_embed_cosine`` (shared code) —
    the IVF assignment is one map-side Arrow pass with an O(K·dim)
    closure, pair enumeration is the sub-bucketed shuffle-hash join
    (never a broadcast of a table-sized side, never O(n²) across
    clusters), and the verdict join is a shuffle anti-semantics left
    join on vec_id.  The drop set is a vanishing fraction of the corpus
    (near-dups above 0.6), so at 100 TB the final join's right side is
    small but NOT assumed broadcastable — hash join on vec_id keeps it
    safe under adversarial duplication rates.

    The pairwise-earlier keep rule (vs sequential greedy) is what makes
    the operator embarrassingly parallel: a verdict depends only on a
    vector's own pair list, not on other verdicts, so there is no
    sequential chain to replay — and it is exactly the rule the SQL
    twin states, keeping the entry value-hash gated.
    """
    dim = _embedding_dim(spark, sf_dir)
    asg = _q._persist_tracked(_ivf_assignment(spark, sf_dir, dim))
    dropped = (
        _subbucketed_pair_cosines(spark, asg, include_centroid=False)
        .withColumn("cos_sim", F.round("cos_sim", 6))
        .where(F.col("cos_sim") >= _SEM_THRESH)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    return (
        asg.select("vec_id", "centroid_id")
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "centroid_id",
            F.coalesce(~F.col("hit"), F.lit(True)).alias("kept"),
        )
    )


ORACLE_SEMDEDUP = f"""
WITH {_IVF_ASSIGN_SQL},
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(
           (SELECT sum(x * y) FROM (SELECT unnest(a.emb) x, unnest(b.emb) y))
           / (a.norm * b.norm), 6) AS cos_sim
  FROM assign a JOIN assign b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id)
SELECT a.vec_id, a.centroid_id,
       a.vec_id NOT IN (
         SELECT vec_b FROM pairs WHERE cos_sim >= {_SEM_THRESH}
       ) AS kept
FROM assign a
"""


# ---------------------------------------------------------------------------
# dedup_ttl_window — exact dedup with a trailing time-to-live
# ---------------------------------------------------------------------------

_TTL_DAYS = 7  # a copy older than this no longer suppresses


def q_dedup_ttl_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication with a trailing TTL: an event is a duplicate
    only if an identical event (same user, type, and dollar-bucketed
    value) occurred within the previous _TTL_DAYS days — older copies
    are forgotten.  This is the batch contract of state-bounded
    streaming dedup (``streaming_dedup`` with watermark eviction): at
    10^12 rows an unbounded "seen" set is impossible, so production
    dedup ALWAYS carries a TTL; this entry pins what that TTL means.

    Per event: kept flag + the gap (in days, NULL for first
    occurrence).  Plan: ONE lag window per identity key,
    hash-partitioned on (user_id, event_type, v) — per-key frames,
    never global; the verdict is row-local arithmetic on the lag.
    Determinism: identity uses exact integer cents; the gap compares
    whole days via epoch-second integer division (identical DIV
    semantics on non-negative operands); ts ties order by event_id.
    """
    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    # identity bucket: whole dollars (cents DIV 100) — coarse enough
    # that repeats actually occur, exact-integer on both engines
    v = F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT) DIV 100")
    keyed = ev.select(
        "event_id",
        F.col("user_id").cast("bigint").alias("user_id"),
        "event_type",
        v.alias("v"),
        F.unix_timestamp("ts").alias("sec"),
    )
    w = Window.partitionBy("user_id", "event_type", "v").orderBy(
        "sec", "event_id"
    )
    lagged = keyed.withColumn("prev_sec", F.lag("sec").over(w))
    gap_days = F.expr("(sec - prev_sec) DIV 86400")
    return lagged.select(
        "event_id",
        "user_id",
        "event_type",
        "v",
        gap_days.cast("bigint").alias("gap_days"),
        F.coalesce(gap_days > F.lit(_TTL_DAYS), F.lit(True)).alias("kept"),
    )


ORACLE_DEDUP_TTL_WINDOW = f"""
WITH keyed AS (
  SELECT event_id, CAST(user_id AS BIGINT) AS user_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) // 100 AS v,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events WHERE value IS NOT NULL),
lagged AS (
  SELECT *, lag(sec) OVER (PARTITION BY user_id, event_type, v
                           ORDER BY sec, event_id) AS prev_sec
  FROM keyed)
SELECT event_id, user_id, event_type, v,
       CAST((sec - prev_sec) // 86400 AS BIGINT) AS gap_days,
       coalesce((sec - prev_sec) // 86400 > {_TTL_DAYS}, TRUE) AS kept
FROM lagged
"""


MINING_QUERIES = {
    "winnow_fingerprints": q_winnow_fingerprints,
    "winnow_matches": q_winnow_matches,
    "scd2_dimension": q_scd2_dimension,
    "semdedup": q_semdedup,
    "dedup_ttl_window": q_dedup_ttl_window,
}

MINING_ORACLES = {
    "winnow_fingerprints": ORACLE_WINNOW_FINGERPRINTS,
    "winnow_matches": ORACLE_WINNOW_MATCHES,
    "scd2_dimension": ORACLE_SCD2_DIMENSION,
    "semdedup": ORACLE_SEMDEDUP,
    "dedup_ttl_window": ORACLE_DEDUP_TTL_WINDOW,
}

_q.QUERIES.update(MINING_QUERIES)
_q.ORACLES.update(MINING_ORACLES)
