"""Round-6 plan assertions: the five fixed-cardinality full-rank
windows flagged by VERDICT r5 ("What's wrong" #1) stay replaced by the
two-level rank (score_deciles / epoch_shuffle house pattern).

The corpus model holds source (and the median-polish grid cell) at
fixed cardinality at every scale factor, so a row-level rank window
partitioned solely by one of those keys funnels n/|keys| rows through
one task's sort.  After round 6:

* ``preference_pairs`` / ``shard_interleave`` /
  ``texttiling_boundaries`` / ``quantile_normalize`` rank via
  per-(key, level-1) counts + a bounded prefix window + row_number
  within (key, level-1) — so NO row_number window in their plans
  partitions solely by the fixed-cardinality key;
* ``median_polish``'s first stage reads the per-cell median off the
  cumulative counts of the (cell, value)-compressed table — the old
  raw-row rank keyed by the concatenated ``gb`` cell id is gone
  entirely (its later sweep medians run on the bounded grid, where
  single-key row_number windows are fine).

Semantics are pinned separately by the DuckDB value-hash gate; these
tests pin the plan property that makes the entries viable at 100 TB.
"""

import contextlib
import io
import re

import pytest

from occular_ocr_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = Q.QUERIES[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    Q.release_persists()
    return buf.getvalue()


def solo_key_row_numbers(plan: str, key: str) -> list:
    """row_number windows whose partition spec is exactly [key]: the
    partition columns come first without a sort direction, so a solo
    partition shows the key followed immediately by a sort column."""
    return re.findall(
        rf"row_number\(\) windowspecdefinition\({key}#\d+L?,"
        rf" \w+#\d+L? (?:ASC|DESC)",
        plan,
    )


@pytest.mark.parametrize(
    ("qname", "key"),
    [
        ("preference_pairs", "source"),
        ("shard_interleave", "source"),
        ("texttiling_boundaries", "g"),
        ("quantile_normalize", "source"),
    ],
)
def test_no_solo_source_rank_window(spark, qname, key):
    p = plan_of(spark, qname)
    assert solo_key_row_numbers(p, key) == [], (
        f"{qname}: row-level rank window partitioned solely by {key} "
        "(fixed cardinality) reappeared — use the two-level rank"
    )
    # the two-level shape is present: at least one row_number window
    # partitioned by (key, level-1) — two partition columns before the
    # first sort direction
    assert re.search(
        rf"row_number\(\) windowspecdefinition\({key}#\d+L?,"
        rf" \w+#\d+L?, \w+#\d+L? (?:ASC|DESC)",
        p,
    ), f"{qname}: two-level rank window missing"


def test_median_polish_cell_stage_compressed(spark):
    p = plan_of(spark, "median_polish")
    # the raw-row rank keyed by the concatenated cell id is gone
    assert "gb#" not in p, (
        "median_polish: the raw-row per-cell rank window (gb key) "
        "reappeared — read the median off the compressed counts"
    )
    # the compressed cumulative-count shape: a sum window partitioned
    # by the (g, b) cell over the counted table
    assert re.search(
        r"sum\(_n#\d+L?\) windowspecdefinition\(g#\d+, b#\d+",
        p,
    ), "median_polish: compressed cumulative-count window missing"
