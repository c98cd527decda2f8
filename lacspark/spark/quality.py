"""Quality-classifier training for training-data pipelines.

The heuristic quality score (queries.quality_score) labels documents;
this module trains a distributed logistic-regression classifier on
cheap JVM-computed text features to REPLACE the heuristic at corpus
scale (the standard bootstrap: heuristic labels → learned classifier
→ filter).  Everything stays in Spark ML (JVM, data-parallel):
feature extraction is a projection, training is MLlib's L-BFGS.

Deterministic: features and labels are pure functions of the text,
the train/test split is the md5-hash split of `sample_stratified`,
and LogisticRegression with fixed params has no random init.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURES = ["n_chars", "n_tokens", "avg_token_len", "alpha_ratio",
            "digit_ratio", "punct_ratio", "space_ratio", "upper_ratio"]


def text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the 8 classifier features — one JVM projection, no
    python, no shuffle."""
    t = F.col(text_col)
    n = F.length(t).cast("double")
    safe_n = F.greatest(n, F.lit(1.0))

    def ratio(pattern: str):
        return (F.length(F.regexp_replace(t, pattern, "")) / safe_n)

    toks = F.filter(F.split(t, " "), lambda x: F.length(x) > 0)
    return (df.withColumn("n_chars", n)
            .withColumn("n_tokens", F.size(toks).cast("double"))
            .withColumn("avg_token_len",
                        n / F.greatest(F.size(toks), F.lit(1))
                        .cast("double"))
            .withColumn("alpha_ratio", 1 - ratio("[A-Za-z]"))
            .withColumn("digit_ratio", 1 - ratio("[0-9]"))
            .withColumn("punct_ratio", 1 - ratio(r"[^\w\s]"))
            .withColumn("space_ratio", 1 - ratio(" "))
            .withColumn("upper_ratio", 1 - ratio("[A-Z]")))


def heuristic_label(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Binary quality label from the same heuristic family as the
    quality_score query: long enough, mostly alphabetic, not
    digit-heavy."""
    return df.withColumn(
        "label",
        ((F.col("n_chars") >= 50)
         & (F.col("alpha_ratio") >= 0.5)
         & (F.col("digit_ratio") <= 0.3)).cast("double"))


def hash_split(df: DataFrame, id_col: str = "doc_id",
               test_pct: int = 10) -> tuple[DataFrame, DataFrame]:
    """Deterministic md5 train/test split (reproducible across runs,
    engines, partitionings — rand() is none of those)."""
    bucket = F.expr(
        "pmod(cast(conv(substring(md5(concat('split:', "
        f"cast({id_col} as string))), 1, 15), 16, 10) as bigint), 100)")
    marked = df.withColumn("__b", bucket)
    return (marked.filter(F.col("__b") >= test_pct).drop("__b"),
            marked.filter(F.col("__b") < test_pct).drop("__b"))


def train_quality_classifier(docs: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id") -> dict:
    """Train LR on heuristic-labeled features; returns the model plus
    held-out metrics.  At 100 TB this exact code runs unchanged: the
    feature projection is embarrassingly parallel and MLlib L-BFGS
    aggregates gradients tree-wise per iteration."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler

    feats = heuristic_label(text_features(docs, text_col), text_col)
    train, test = hash_split(feats, id_col)
    asm = VectorAssembler(inputCols=FEATURES, outputCol="features")
    lr = LogisticRegression(maxIter=25, regParam=0.01,
                            standardization=True)
    model = lr.fit(asm.transform(train))
    pred = model.transform(asm.transform(test))
    auc = BinaryClassificationEvaluator(
        metricName="areaUnderROC").evaluate(pred)
    acc = pred.filter(
        (F.col("prediction") == F.col("label"))).count() / max(
        pred.count(), 1)
    return {"model": model, "auc": auc, "accuracy": acc,
            "n_train": train.count(), "n_test": test.count()}
