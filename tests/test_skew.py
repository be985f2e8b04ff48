"""Salted repartitioning: the mega-conversation must spread across tasks.

The north rule requires "salted repartitioning for skewed
mega-conversations" — the anti-pattern being one 10^6-turn conversation
serializing into one task (the analog of the reference's main-thread
rasterization bottleneck, pipeline.py:139-141).  The partition_id
lineage column makes the spread directly observable.
"""

from pyspark.sql import functions as F

from occular_ocr_spark.fixtures import transcripts_pandas
from occular_ocr_spark.job import extract_detailed


def _mega_fixture(spark):
    # zipf 1.3 with 60 convs: conv-000000 carries ~30x the mean turns
    pdf = transcripts_pandas(n_convs=60, turns_per_conv_mean=6, seed=77)
    return spark.createDataFrame(pdf), pdf


def test_unsalted_mega_conversation_serializes(spark):
    # fast_path off: this test observes the Python stage's partitioning
    # specifically (plain rows on the JVM fast path keep their scan
    # partition and never ride the salted exchange at all)
    df, pdf = _mega_fixture(spark)
    out = extract_detailed(
        df, num_partitions=8, salt_buckets=0, jvm_plain_fast_path=False
    )
    parts = (
        out.groupBy("conv_id")
        .agg(F.countDistinct("partition_id").alias("n_parts"))
        .where(F.col("conv_id") == "conv-000000")
        .first()
    )
    assert parts["n_parts"] == 1  # hash(conv_id) alone: one task owns it all


def test_salted_mega_conversation_spreads(spark):
    df, pdf = _mega_fixture(spark)
    out = extract_detailed(
        df, num_partitions=8, salt_buckets=4, jvm_plain_fast_path=False
    )
    agg = {
        r["conv_id"]: r["n_parts"]
        for r in out.groupBy("conv_id")
        .agg(F.countDistinct("partition_id").alias("n_parts"))
        .collect()
    }
    assert agg["conv-000000"] >= 2  # the mega-conv now spans tasks

    # ...and salting must not perturb the extraction contract: same rows,
    # same per-turn text as the unsalted run.
    unsalted = extract_detailed(df, num_partitions=8, salt_buckets=0)
    key = lambda r: (r["conv_id"], r["turn_idx"])
    a = sorted(((key(r), r["text"]) for r in out.select("conv_id", "turn_idx", "text").collect()))
    b = sorted(((key(r), r["text"]) for r in unsalted.select("conv_id", "turn_idx", "text").collect()))
    assert a == b
