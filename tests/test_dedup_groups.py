"""dedup_groups semantics through the REAL pipeline: transitivity.

Connected components is what turns verified PAIRS into actionable
GROUPS — its defining property is transitive closure: A≈B and B≈C must
land A, B, C in ONE group even when (A, C) is below the pair threshold
and never forms an edge.  The DuckDB oracle pins equality on the
fixture corpus; this test pins the semantics on a crafted chain.
"""

import pytest

from occular_ocr_spark.queries import QUERIES, q_dedup_minhash_verify

# the md5-band dice are deterministic per string; this alphabet is one
# where BOTH chain links collide in a band at their Jaccard levels
WORDS = [f"tok{i:02d}" for i in range(40)]


def _doc(lo, hi):
    return " ".join(WORDS[lo:hi])


# A: w0..w19, B: w3..w22, C: w6..w26  (3-word shingle Jaccard:
# A-B ≈ 0.71 and B-C ≈ 0.68 clear the 0.5 verify threshold; A-C ≈ 0.48
# does not), D: disjoint singleton.
DOCS = [
    (0, _doc(0, 20)),
    (1, _doc(3, 23)),
    (2, _doc(6, 27)),
    (3, " ".join(f"other{i}" for i in range(20))),
]


@pytest.fixture(scope="module")
def chain_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf-chain")
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_chain_edges_are_pairwise_only(spark, chain_sf_dir):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in q_dedup_minhash_verify(spark, chain_sf_dir).collect()
    }
    assert (0, 1) in pairs and (1, 2) in pairs  # the chain links
    assert (0, 2) not in pairs  # below threshold: NOT a direct pair
    assert not any(3 in p for p in pairs)  # singleton untouched


def test_groups_close_transitively(spark, chain_sf_dir):
    groups = {
        r["doc_id"]: r["group_id"]
        for r in QUERIES["dedup_groups"](spark, chain_sf_dir).collect()
    }
    assert groups == {0: 0, 1: 0, 2: 0, 3: 3}


def test_largestar_matches_minlabel_on_chain(spark, chain_sf_dir):
    """The O(log n) large-star/small-star CC must close the same chain
    transitively and keep the singleton."""
    groups = {
        r["doc_id"]: r["group_id"]
        for r in QUERIES["cc_largestar"](spark, chain_sf_dir).collect()
    }
    assert groups == {0: 0, 1: 0, 2: 0, 3: 3}


def test_largestar_matches_minlabel_on_corpus(spark):
    """Label-for-label agreement between the two CC implementations on
    the real sf0.001 corpus — same edges, same components."""
    sf = "/root/testdata/sf0.001"
    ml = {r["doc_id"]: r["group_id"] for r in QUERIES["dedup_groups"](spark, sf).collect()}
    ls = {r["doc_id"]: r["group_id"] for r in QUERIES["cc_largestar"](spark, sf).collect()}
    assert ml == ls and len(ml) > 0
