#!/usr/bin/env python
"""Deterministic sf1 (10x sf0.1) fixture builder (round 5, VERDICT r4
#5).  The driver's generator for /root/testdata is not available in
the sandbox (TESTDATA.md: read-only), so sf1 is synthesized as a
key-shifted 10-copy replication of sf0.1:

* every BIGINT key column (doc_id, *_key, event_id, user_id, vec_id)
  gets ``+ k * 10_000_000`` per copy k — joins stay WITHIN a copy, so
  per-key join cardinalities match sf0.1 while row counts are 10x;
* ``region``/``nation`` stay single-copy (fixed dimensions — group
  fan-in per nation grows 10x, the realistic scale-up shape);
* ``documents.text`` is perturbed per copy by tagging every 5th token
  (``w -> w || 'x' || k``): ~60% of 3-word shingles change, so copies
  are NOT near-duplicates of each other (Jaccard ≈ 0.25 < 0.5) and the
  dedup entries measure 10x DATA, not an artificial 10x-denser dup
  graph; ``n_chars`` is recomputed.  The doc_id offset is a multiple
  of 20, preserving the flagship's doc_id%4 branch mix and doc_id//10
  conversation grouping.

Output: $1 (default /tmp/occ_sf1) — one parquet per table, DuckDB-
generated, bit-reproducible.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000
COPIES = 10

# table -> (key columns to shift, passthrough tail columns)
_SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}


def _cols(con, table: str) -> list[str]:
    return [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{table}.parquet')"
        ).fetchall()
    ]


def build(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    copies = f"(SELECT unnest(range({COPIES})) AS k) c"

    for table in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{table}.parquet')) "
            f"TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)"
        )

    for table, keys in _SHIFT.items():
        sel = ", ".join(
            f"t.{c} + c.k * {OFF} AS {c}" if c in keys else f"t.{c}"
            for c in _cols(con, table)
        )
        con.execute(
            f"COPY (SELECT {sel} "
            f"FROM read_parquet('{SRC}/{table}.parquet') t CROSS JOIN {copies} "
            f"ORDER BY {keys[0]}) "
            f"TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)"
        )

    text = (
        "CASE WHEN c.k = 0 THEN t.text ELSE array_to_string("
        "list_transform(string_split(t.text, ' '), "
        "(w, i) -> CASE WHEN i % 5 = 0 THEN w || 'x' || c.k ELSE w END), ' ') END"
    )
    con.execute(
        f"COPY (SELECT t.doc_id + c.k * {OFF} AS doc_id, {text} AS text, "
        f"t.lang, t.source, CAST(length({text}) AS BIGINT) AS n_chars "
        f"FROM read_parquet('{SRC}/documents.parquet') t CROSS JOIN {copies} "
        f"ORDER BY doc_id) "
        f"TO '{out_dir}/documents.parquet' (FORMAT PARQUET)"
    )

    for table in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n}")


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/occ_sf1")
