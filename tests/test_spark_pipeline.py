"""Spark layer: tagger parity vs oracle, KG pipeline, resume, K6/K7."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from lacspark.engine import LacEngine
from lacspark.spark.canonical import (candidate_pairs, canonical_map,
                                      connected_components, minhash_bands,
                                      surface_forms)
from lacspark.spark.kg import mention_salience_topk
from lacspark.spark.pipeline import run_pipeline
from lacspark.spark.repos_files import synth_repos_files
from lacspark.spark.tagger import explode_mentions, tag_and_extract

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").limit(120).cache()


def test_tagger_matches_oracle_exactly(spark, docs):
    """The distributed plumbing (partitioning, Arrow transfer, worker
    singletons) must not change results: Spark output ≡ driver-side
    engine, row for row."""
    tagged = tag_and_extract(docs.repartition(7), "text", mode="rank")
    got = {r.doc_id: r for r in tagged.collect()}
    rows = docs.collect()
    eng = LacEngine()
    oracle = eng.run_batch([r.text for r in rows], "rank")
    for r, o in zip(rows, oracle):
        g = got[r.doc_id]
        assert list(g.words) == o.words
        assert list(g.tags) == o.tags
        assert list(g.ranks) == (o.ranks or [0] * len(o.words))
        om, ot = eng.extract(o)
        assert [tuple(m) for m in g.mentions] == om
        assert [(t.subj, t.pred, t.obj, t.conf, t.sal)
                for t in g.triples] == ot


def test_custom_lines_respected_in_udf(spark):
    df = spark.createDataFrame([(0, "春天的花开")], "doc_id long, text string")
    tagged = tag_and_extract(df, "text", mode="lac",
                             custom_lines=("春天/SEASON",))
    row = tagged.collect()[0]
    assert "SEASON" in list(row.tags)


def test_pipeline_end_to_end_and_resume(spark, tmp_path):
    out = str(tmp_path / "kg")
    files = synth_repos_files(spark, n_files=300).cache()
    m1 = run_pipeline(spark, files, out, run_id="r1", n_buckets=8,
                      build_graph=True)
    assert m1["n_files"] == 300
    assert m1["n_sha_bad"] == 0
    assert m1["n_triples"] > 0
    # resume: everything already committed → zero work
    m2 = run_pipeline(spark, files, out, run_id="r2", n_buckets=8,
                      build_graph=False)
    assert m2["n_files"] == 0 and m2["n_buckets_processed"] == 0
    # graph tables exist and are consistent
    v = spark.read.parquet(out + "/kg_vertices")
    e = spark.read.parquet(out + "/kg_edges")
    assert v.count() > 0 and e.count() > 0
    assert v.filter(F.col("canonical").isNull()).count() == 0
    # every edge endpoint id resolves... (self-entities allowed)
    assert e.filter(F.col("subj_id").isNull() | F.col("obj_id").isNull()) \
        .count() == 0


def test_pipeline_partial_resume(spark, tmp_path):
    """Kill-and-restart: lineage rows only for half the buckets →
    rerun processes exactly the other half."""
    out = str(tmp_path / "kg2")
    files = synth_repos_files(spark, n_files=200).cache()
    run_pipeline(spark, files, out, run_id="a", n_buckets=8,
                 build_graph=False)
    lineage = spark.read.parquet(out + "/lineage")
    # simulate a crash that committed only buckets 0-3
    kept_rows = lineage.filter(F.col("bucket") < 4).collect()
    schema = lineage.schema
    shutil.rmtree(out + "/lineage")
    spark.createDataFrame(kept_rows, schema).write.parquet(out + "/lineage")
    m = run_pipeline(spark, files, out, run_id="b", n_buckets=8,
                     build_graph=False)
    redone = set(
        r.bucket for r in spark.read.parquet(out + "/lineage")
        .filter(F.col("run_id") == "b").select("bucket").collect())
    assert redone == {4, 5, 6, 7}
    assert m["n_files"] > 0


def test_minhash_deterministic_and_groups_similar(spark):
    data = [("spark_table",), ("spark_tables",), ("querymerge",),
            ("query_merge",), ("zzz",)]
    mentions = spark.createDataFrame(data, "word string")
    cmap1 = {r.form: r.canonical for r in canonical_map(mentions).collect()}
    cmap2 = {r.form: r.canonical for r in canonical_map(mentions).collect()}
    assert cmap1 == cmap2  # deterministic across runs
    assert cmap1["spark_table"] == cmap1["spark_tables"]
    assert cmap1["zzz"] == "zzz"


def test_connected_components_chain(spark):
    verts = spark.createDataFrame([("a",), ("b",), ("c",), ("d",), ("e",)],
                                  "form string")
    edges = spark.createDataFrame([("b", "c"), ("c", "d")],
                                  "src string, dst string")
    expected = {"a": "a", "b": "b", "c": "b", "d": "b", "e": "e"}
    # driver union-find path (small graph)
    labels = {r.form: r.canonical
              for r in connected_components(verts, edges).collect()}
    assert labels == expected
    # distributed iterative path must agree exactly
    dist = {r.form: r.canonical
            for r in connected_components(verts, edges,
                                          driver_threshold=0).collect()}
    assert dist == expected


def test_connected_components_long_chain_and_random(spark):
    """large/small-star must agree with driver union-find on (a) a
    120-node chain — diameter far beyond the old 20-round min-label
    cap — and (b) a deterministic pseudo-random graph."""
    chain = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(119)]
    import hashlib
    rand = [(f"v{int(hashlib.md5(f'a{i}'.encode()).hexdigest()[:4], 16) % 60:02d}",
             f"v{int(hashlib.md5(f'b{i}'.encode()).hexdigest()[:4], 16) % 60:02d}")
            for i in range(80)]
    for edge_list in (chain, rand):
        nodes = sorted({n for e in edge_list for n in e})
        verts = spark.createDataFrame([(n,) for n in nodes], "form string")
        edges = spark.createDataFrame(
            [e for e in edge_list if e[0] != e[1]], "src string, dst string")
        ref = {r.form: r.canonical
               for r in connected_components(verts, edges).collect()}
        dist = {r.form: r.canonical
                for r in connected_components(
                    verts, edges, driver_threshold=0).collect()}
        assert dist == ref


def test_salience_topk(spark, docs):
    tagged = tag_and_extract(docs, "text", mode="rank")
    mentions = explode_mentions(tagged, ["doc_id"])
    top = mention_salience_topk(mentions, ["doc_id"], k=3)
    per_doc = top.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0]
    assert per_doc <= 3


def test_very_long_document_through_spark_tagger(spark):
    """A 100k-char outlier document must flow through the Arrow batch
    + length-bucketed chunking intact (the join invariant holds and
    no row is truncated) alongside normal-size rows."""
    from lacspark.spark.tagger import tag_and_extract

    long_text = ("spark shuffles data across the cluster " * 2500).strip()
    assert len(long_text) > 90_000
    rows = [(1, long_text), (2, "short row"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           tag_and_extract(df, "text", mode="rank").collect()}
    assert "".join(out[1].words) == long_text
    assert "".join(out[2].words) == "short row"
    assert out[3].words == []
    assert len(out[1].ranks) == len(out[1].words)


def test_build_edges_salience_weighting(spark):
    """Edge weight folds O17 mention importance into provenance:
    each triple contributes conf x (1 + subj_rank + obj_rank), so a
    salient pair outweighs a throwaway pair at equal count; the raw
    salience sum rides along unmixed."""
    from lacspark.spark.graph import build_edges

    triples = spark.createDataFrame(
        [("alpha", "links", "beta", 0.5, 6),
         ("alpha", "links", "beta", 0.25, 0),
         ("gamma", "links", "delta", 0.75, 1)],
        "subj string, pred string, obj string, conf double, sal int")
    cmap = spark.createDataFrame(
        [], "form string, canonical string, entity_id long")
    rows = {(r.subj_canonical, r.obj_canonical): r
            for r in build_edges(triples, cmap).collect()}
    ab = rows[("alpha", "beta")]
    assert ab.weight == 0.5 * 7 + 0.25 * 1   # 3.75, exact
    assert ab.salience == 6 and ab.n_provenance == 2
    gd = rows[("gamma", "delta")]
    assert gd.weight == 0.75 * 2 and gd.salience == 1


def test_canonical_fast_path_matches_distributed(spark, docs):
    """canonical_map's driver fast path (python twin over the
    collected form set) must equal the distributed banded path
    row-for-row on the same mentions."""
    from lacspark.spark.canonical import canonical_map
    from lacspark.spark.tagger import explode_mentions, tag_and_extract

    tagged = tag_and_extract(docs, "text", mode="rank")
    mentions = explode_mentions(tagged, ["doc_id"]).cache()
    fast = canonical_map(mentions)                       # driver path
    slow = canonical_map(mentions, driver_threshold=0)   # banded path
    f = sorted(tuple(r) for r in fast.collect())
    s = sorted(tuple(r) for r in slow.collect())
    assert f == s
    assert len(f) > 0


def test_canonical_char_budget_forces_distributed(spark):
    """A pathological form set — few forms but very LONG ones — must
    fall through to the distributed path: the driver fast path's cost
    is total chars (3-grams x hashes), not form count, so the probe
    bounds chars too.  Exercised by shrinking the budget below the
    corpus; results must match the unconstrained run."""
    from lacspark.spark.canonical import canonical_map

    rows = [(f"entity {'x' * 500}{i % 7}",) for i in range(40)]
    mentions = spark.createDataFrame(rows, "word string")
    small = canonical_map(mentions, driver_char_budget=1_000)
    big = canonical_map(mentions)
    assert sorted(map(tuple, small.collect())) == \
        sorted(map(tuple, big.collect()))
