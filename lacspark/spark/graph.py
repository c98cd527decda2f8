"""K8: graph materialization — kg_vertices / kg_edges.

Vertices aggregate canonicalized mentions (aliases, frequency,
salience); edges aggregate canonicalized triples with confidence
weights and provenance counts.  Both are plain hash aggregates —
Catalyst gives partial/final (map-side combine) for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .canonical import MD5INT


def _with_canonical(df: DataFrame, cmap: DataFrame, col: str,
                    out_prefix: str) -> DataFrame:
    """Join a surface-form column to its canonical entity.  Forms not
    in the map (len<2 or never canonicalized) are their own entity."""
    norm = F.lower(F.trim(F.col(col)))
    joined = df.withColumn(f"__{col}_form", norm).join(
        cmap.select(F.col("form").alias(f"__{col}_form"),
                    F.col("canonical").alias(f"{out_prefix}_canonical"),
                    F.col("entity_id").alias(f"{out_prefix}_id")),
        on=f"__{col}_form", how="left")
    return (joined
            .withColumn(f"{out_prefix}_canonical",
                        F.coalesce(f"{out_prefix}_canonical",
                                   f"__{col}_form"))
            .withColumn(f"{out_prefix}_id",
                        F.coalesce(f"{out_prefix}_id",
                                   F.expr(MD5INT.format(
                                       x=f"{out_prefix}_canonical"))))
            .drop(f"__{col}_form"))


def build_vertices(mentions: DataFrame, cmap: DataFrame,
                   max_aliases: int = 32) -> DataFrame:
    m = _with_canonical(mentions, cmap, "word", "entity")
    return (m.groupBy("entity_id", "entity_canonical")
            .agg(F.count(F.lit(1)).alias("n_mentions"),
                 F.sum("rank").alias("salience"),
                 F.slice(F.array_sort(F.collect_set(F.lower(F.trim("word")))),
                         1, max_aliases).alias("aliases"),
                 F.countDistinct("tag").alias("n_tags"),
                 F.max("tag").alias("top_tag"))
            .withColumnRenamed("entity_canonical", "canonical"))


def build_edges(triples: DataFrame, cmap: DataFrame) -> DataFrame:
    t = _with_canonical(triples, cmap, "subj", "subj")
    t = _with_canonical(t, cmap, "obj", "obj")
    return (t.withColumn("pred_norm", F.lower(F.trim("pred")))
            .groupBy("subj_id", "subj_canonical", "pred_norm",
                     "obj_id", "obj_canonical")
            .agg(F.sum("conf").alias("weight"),
                 F.count(F.lit(1)).alias("n_provenance"))
            .withColumnRenamed("pred_norm", "pred"))
