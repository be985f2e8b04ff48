"""Semantics tests for the wave-96 planted-truth entries — the whole
point of this wave is that ground truth is KNOWN, so the assertions
are sharp: dedup recall is exactly 1, FK detection is exactly the
plant, the drift flag fires on the plant and not on the null."""

from __future__ import annotations

import hashlib

import duckdb

from occular_ocr_spark import queries as Q
from occular_ocr_spark.queries_planted import (
    _FK_PCT,
    _PA_PCT,
    _SK_AMP,
    q_planted_anomaly_recall,
    q_planted_drift_detection,
    q_planted_dup_recall,
    q_planted_fk_violation_detect,
    q_planted_skew_hotkey_detect,
)

SF = "/root/testdata/sf0.001"


def _h100(v, salt):
    return int(hashlib.md5(f"{v}:{salt}".encode()).hexdigest()[:4], 16) % 100


def test_dup_recall_is_total(spark):
    rows = q_planted_dup_recall(spark, SF).collect()
    # every group has multiplicity exactly 2 -> single histogram row
    assert len(rows) == 1
    r = rows[0]
    assert r["copies"] == 2
    assert r["n_groups"] == r["planted_groups"]
    assert r["recall_micro"] == 1_000_000


def test_anomaly_recall_counts(spark):
    days = [
        d
        for (d,) in duckdb.sql(
            f"SELECT DISTINCT CAST(l_shipdate AS DATE)"
            f" FROM '{SF}/lineitem.parquet'"
        ).fetchall()
    ]
    planted = sum(1 for d in days if _h100(d, "pa") < _PA_PCT)
    r = q_planted_anomaly_recall(spark, SF).collect()[0]
    assert r["planted_days"] == planted
    assert r["true_positives"] <= r["planted_days"]
    assert r["true_positives"] <= r["flagged_days"]
    # a x10 spike is grossly anomalous: the MAD rule catches most
    assert r["recall_micro"] >= 800_000


def test_fk_detection_exact(spark):
    r = q_planted_fk_violation_detect(spark, SF).collect()[0]
    assert bool(r["exact_match"]) is True
    assert r["planted_violations"] == r["detected_orphans"] == r["overlap"]
    assert r["planted_violations"] > 0


def test_skew_amplification_exact(spark):
    r = q_planted_skew_hotkey_detect(spark, SF).collect()[0]
    assert r["freq_after"] == _SK_AMP * r["freq_before"]
    assert r["tot_after"] == r["tot_before"] + (_SK_AMP - 1) * r["freq_before"]
    assert r["share_after_micro"] > r["share_before_micro"]
    assert r["amplification_micro"] == _SK_AMP * 1_000_000


def test_drift_flag_fires_only_on_plant(spark):
    rows = {r["scenario"]: r for r in q_planted_drift_detection(spark, SF).collect()}
    assert set(rows) == {"planted", "null"}
    assert bool(rows["planted"]["detected"]) is True
    assert bool(rows["null"]["detected"]) is False
    assert rows["planted"]["chi2_micro"] > rows["null"]["chi2_micro"]


def test_registered_in_catalog():
    for name in (
        "planted_dup_recall",
        "planted_anomaly_recall",
        "planted_fk_violation_detect",
        "planted_skew_hotkey_detect",
        "planted_drift_detection",
    ):
        assert name in Q.QUERIES and name in Q.ORACLES
