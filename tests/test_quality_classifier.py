"""Quality-classifier trainer (spark/quality.py): the MLlib LR must
learn the heuristic labels from the features (high held-out AUC),
the hash split must be deterministic and disjoint, and the whole
path must be rerun-stable."""

from __future__ import annotations

from pyspark.sql import functions as F

from lacspark.spark.quality import (hash_split, heuristic_label,
                                    text_features,
                                    train_quality_classifier)

SF = "/root/testdata/sf0.001"


def test_split_deterministic_and_disjoint(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    tr1, te1 = hash_split(d)
    tr2, te2 = hash_split(d.repartition(7))
    assert te1.count() == te2.count()
    ids1 = {r.doc_id for r in te1.select("doc_id").collect()}
    ids2 = {r.doc_id for r in te2.select("doc_id").collect()}
    assert ids1 == ids2                       # partitioning-invariant
    assert tr1.count() + te1.count() == d.count()
    overlap = tr1.select("doc_id").join(te1.select("doc_id"), "doc_id")
    assert overlap.count() == 0


def test_classifier_learns_heuristic(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    res = train_quality_classifier(d)
    assert res["n_train"] + res["n_test"] == d.count()
    # the label IS a function of the features, so LR must separate
    # it well out of sample
    assert res["auc"] >= 0.9, res
    assert res["accuracy"] >= 0.85, res


def test_features_are_jvm_only(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = text_features(d)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
