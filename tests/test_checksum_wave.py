"""Semantics tests for the wave-69 integrity-checksum entries:
bucket digests, replica diff, Merkle levels, digest dupes,
incremental update identity.  The DuckDB value-hash gate is
scripts/check_queries.py; these pin each op against hashlib
recomputations and the anti-entropy invariants."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_checksum import (
    _CORRUPT_ID,
    _DELTA_MOD,
    _N_BUCKETS,
    _SEP,
    q_incremental_checksum_update,
    q_merkle_tree_levels,
    q_replica_diff_checksums,
    q_row_digest_dupes,
    q_table_checksum_buckets,
)

SF = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _dig(s: str) -> int:
    return int(_md5(s)[:8], 16)


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, text, lang, source, n_chars"
        f" FROM '{SF}/documents.parquet'"
    ).fetchall()


def _row(doc_id, text, lang, source, n_chars) -> str:
    return _SEP.join(
        [str(doc_id), text or "", lang or "", source or "", str(n_chars)]
    )


def _leaves():
    agg = defaultdict(lambda: [0, 0])
    for d in _docs():
        b = d[0] % _N_BUCKETS
        agg[b][0] += 1
        agg[b][1] += _dig(_row(*d))
    return agg


# ---------------------------------------------------------------------------
# table_checksum_buckets
# ---------------------------------------------------------------------------


def test_bucket_checksums_match_hashlib(spark):
    want = _leaves()
    got = {
        r["bucket"]: r
        for r in q_table_checksum_buckets(spark, SF).collect()
    }
    assert set(got) == set(want)
    for b, (n, s) in want.items():
        assert got[b]["n_rows"] == n
        assert got[b]["digest_sum"] == s


# ---------------------------------------------------------------------------
# replica_diff_checksums
# ---------------------------------------------------------------------------


def test_replica_diff_localizes_corruption(spark):
    rows = q_replica_diff_checksums(spark, SF).collect()
    differs = [r for r in rows if r["differs"]]
    assert len(differs) == 1
    assert differs[0]["bucket"] == _CORRUPT_ID % _N_BUCKETS
    # and the expected replica sum matches a hashlib recomputation
    want = 0
    for d in _docs():
        if d[0] % _N_BUCKETS == _CORRUPT_ID % _N_BUCKETS:
            text = (d[1] or "") + (
                "~corrupt" if d[0] == _CORRUPT_ID else ""
            )
            want += _dig(_row(d[0], text, d[2], d[3], d[4]))
    assert differs[0]["replica_sum"] == want


# ---------------------------------------------------------------------------
# merkle_tree_levels
# ---------------------------------------------------------------------------


def test_merkle_levels_match_hashlib(spark):
    leaves_raw = _leaves()
    leaf_dig = {
        b: _md5(f"{s}:{n}") for b, (n, s) in leaves_raw.items()
    }
    mids = {}
    for m in range(4):
        children = [leaf_dig[b] for b in sorted(leaf_dig) if b // 4 == m]
        mids[m] = _md5("".join(children))
    root = _md5("".join(mids[m] for m in sorted(mids)))
    rows = q_merkle_tree_levels(spark, SF).collect()
    got = {(r["level"], r["idx"]): r["digest"] for r in rows}
    assert len(rows) == _N_BUCKETS + 4 + 1
    for b, dg in leaf_dig.items():
        assert got[(2, b)] == dg
    for m, dg in mids.items():
        assert got[(1, m)] == dg
    assert got[(0, 0)] == root


def test_merkle_root_changes_iff_any_row_changes():
    """Pure-hashlib property check of the scheme: corrupting one row
    changes its leaf, its parent, and the root."""
    leaves_raw = _leaves()
    base_leaf = {b: _md5(f"{s}:{n}") for b, (n, s) in leaves_raw.items()}
    # corrupt doc _CORRUPT_ID
    b0 = _CORRUPT_ID % _N_BUCKETS
    delta = 0
    for d in _docs():
        if d[0] == _CORRUPT_ID:
            delta = _dig(
                _row(d[0], (d[1] or "") + "~corrupt", d[2], d[3], d[4])
            ) - _dig(_row(*d))
    n, s = leaves_raw[b0]
    corrupted_leaf = _md5(f"{s + delta}:{n}")
    assert corrupted_leaf != base_leaf[b0]
    assert delta != 0


# ---------------------------------------------------------------------------
# row_digest_dupes
# ---------------------------------------------------------------------------


def test_digest_dupes_match_duckdb(spark):
    got = {r["tbl"]: r for r in q_row_digest_dupes(spark, SF).collect()}
    # documents: unique rows, so digests unique (no collisions at n=500)
    assert got["documents"]["dup_digest_rows"] == 0
    # lineitem projection: recompute with hashlib
    li = duckdb.sql(
        f"""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
               l_returnflag, l_linestatus, CAST(l_shipdate AS VARCHAR)
            FROM '{SF}/lineitem.parquet'"""
    ).fetchall()
    digs = Counter(
        _dig(_SEP.join(str(c) for c in row)) for row in li
    )
    assert got["lineitem"]["n_rows"] == len(li)
    assert got["lineitem"]["ndv_digest"] == len(digs)
    assert got["lineitem"]["dup_digest_rows"] == len(li) - len(digs)


# ---------------------------------------------------------------------------
# incremental_checksum_update
# ---------------------------------------------------------------------------


def test_incremental_identity_holds(spark):
    [r] = q_incremental_checksum_update(spark, SF).collect()
    assert r["matches"]
    assert r["incremental_sum"] == r["recomputed_sum"]
    # hashlib recomputation of every component
    old = sum(_dig(_row(*d)) for d in _docs())
    d_old = sum(
        _dig(_row(*d)) for d in _docs() if d[0] % _DELTA_MOD == 0
    )
    d_new = sum(
        _dig(_row(d[0], (d[1] or "") + "+v2", d[2], d[3], d[4]))
        for d in _docs()
        if d[0] % _DELTA_MOD == 0
    )
    n_delta = sum(1 for d in _docs() if d[0] % _DELTA_MOD == 0)
    assert r["old_sum"] == old
    assert r["delta_rows"] == n_delta and n_delta > 0
    assert r["delta_old_sum"] == d_old
    assert r["delta_new_sum"] == d_new
    assert r["incremental_sum"] == old - d_old + d_new


def test_registered_in_catalog():
    for name in (
        "table_checksum_buckets",
        "replica_diff_checksums",
        "merkle_tree_levels",
        "row_digest_dupes",
        "incremental_checksum_update",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
