"""ANN quality: the multi-probe LSH scale path must recover a
meaningful fraction of the exact brute-force top-k, and probing must
strictly beat the single-bucket variant (the structural reason the
multi-probe sequence exists)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lacspark.spark.similarity import (cosine_topk, ivf_list_sizes,
                                       ivf_topk, lsh_bucketed_topk)

SF_DIR = os.environ.get("LACSPARK_TEST_SF", "/root/testdata/sf0.001")


def _topk_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_lsh_recall_at_5(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = _topk_sets(cosine_topk(queries, emb, "vec_id", "embedding", k=5))

    def recall(probe_radius: int, nbands: int = 1) -> float:
        approx = _topk_sets(lsh_bucketed_topk(
            queries, emb, "vec_id", "embedding", k=5, nbits=8,
            probe_radius=probe_radius, nbands=nbands))
        per_q = [len(exact[q] & approx.get(q, set())) / len(exact[q])
                 for q in exact]
        return sum(per_q) / len(per_q)

    r0, r2 = recall(0), recall(2)
    # radius-2 probing scans ~14% of the corpus (37/256 codes); on the
    # synthetic near-uniform embeddings that recovers ~30% of the true
    # top-5 vs ~4% for the single bucket — assert the ordering and a
    # conservative floor
    assert r2 > r0
    assert r2 >= 0.15, f"multi-probe recall@5 collapsed: {r2}"
    # the SHIPPED config (ann_lsh_topk): 4 disjoint 8-bit bands at
    # radius 2.  Bands compound (1-(1-p)^4): measured 0.79-0.85
    # across the sf0.001/0.01/0.1 fixtures — the near-uniform
    # synthetic embeddings are LSH's worst case, so this floor holds
    # with margin on any clustered real corpus
    r4band = recall(2, nbands=4)
    assert r4band >= 0.7, \
        f"4-band LSH recall@5 below target: {r4band}"
    assert r4band > r2, "adding bands must not lose recall"


def test_ivf_recall_beats_probe_fraction(spark):
    """IVF with nprobe lists must (a) recall more of the exact top-5
    as nprobe grows and (b) at nprobe = n_lists degenerate to exact
    brute force (every list probed → full scan, so recall = 1)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = _topk_sets(cosine_topk(queries, emb, "vec_id", "embedding", k=5))

    def recall(nprobe: int) -> float:
        approx = _topk_sets(ivf_topk(
            queries, emb, "vec_id", "embedding", 64,
            k=5, nprobe=nprobe, n_lists=16, iters=2,
            memo_key=SF_DIR))
        per_q = [len(exact[q] & approx.get(q, set())) / len(exact[q])
                 for q in exact]
        return sum(per_q) / len(per_q)

    r1, r3, r_all = recall(1), recall(3), recall(16)
    assert r3 >= r1
    assert r3 >= 0.2, f"ivf nprobe=3 recall@5 collapsed: {r3}"
    assert r_all == 1.0, f"nprobe=n_lists must be exact, got {r_all}"


def test_ivf_lists_partition_corpus(spark):
    """Every corpus vector lands in exactly one inverted list — with
    the label-free k-means codebook, as on a real corpus."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    sizes = ivf_list_sizes(emb, "vec_id", "embedding", 64,
                           n_lists=16, iters=2,
                           memo_key=SF_DIR).collect()
    assert sum(r.n_vectors for r in sizes) == emb.count()
    assert len(sizes) <= 16


def test_kmeans_codebook_deterministic_and_memo_invalidates(
        spark, tmp_path):
    """The k-means codebook is a pure function of the data (seedless
    md5-stratified init, fixed iterations, rounded updates): two
    fresh computations agree exactly.  A path memo key fingerprints
    the files, so rewriting the data at the same path invalidates
    the cached codebook instead of serving a stale one."""
    import os
    import time

    from lacspark.spark.similarity import kmeans_codebook

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = kmeans_codebook(emb, "vec_id", "embedding", 64,
                        n_lists=8, iters=2)
    b = kmeans_codebook(emb, "vec_id", "embedding", 64,
                        n_lists=8, iters=2)
    assert a == b
    assert len(a[0]) <= 8 and len(a[0]) == len(a[1])

    # memo invalidation: same path, different data → different book
    path = str(tmp_path / "vecs.parquet")
    emb.limit(100).write.mode("overwrite").parquet(path)
    first = kmeans_codebook(spark.read.parquet(path), "vec_id",
                            "embedding", 64, n_lists=4, iters=1,
                            memo_key=path)
    time.sleep(0.01)
    emb.filter("vec_id >= 200").limit(100).write.mode("overwrite") \
        .parquet(path)
    os.utime(path)  # directory mtime; file mtimes changed by rewrite
    second = kmeans_codebook(spark.read.parquet(path), "vec_id",
                             "embedding", 64, n_lists=4, iters=1,
                             memo_key=path)
    assert first != second


def test_pq_recall_at_5(spark):
    """Product-quantization ADC + exact rerank must recover most of
    the exact top-5 on the near-uniform fixture (PQ's worst case —
    no cluster structure for the 8-dim×32-centroid cells): measured
    0.89 at sf0.001 with the shipped M=8/K=32/rerank=100 config."""
    from lacspark.spark.similarity import pq_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = _topk_sets(cosine_topk(queries, emb, "vec_id",
                                   "embedding", k=5))
    approx = _topk_sets(pq_topk(queries, emb, "vec_id", "embedding",
                                64, k=5, memo_key=SF_DIR))
    per_q = [len(exact[q] & approx.get(q, set())) / len(exact[q])
             for q in exact]
    recall = sum(per_q) / len(per_q)
    assert recall >= 0.6, f"PQ recall@5 collapsed: {recall}"


def test_pq_codes_are_compact_and_deterministic(spark):
    """The code table carries one small int per subspace (the
    compressed form the ADC scan reads) and is identical under any
    input partitioning."""
    from lacspark.spark.similarity import pq_codebooks, pq_encode

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books = pq_codebooks(emb, "vec_id", "embedding", 64,
                         m=8, k=32, iters=2, memo_key=SF_DIR)
    assert len(books) == 8
    for ids, cents in books:
        assert len(ids) == len(cents) <= 32
        assert ids == sorted(ids)          # id-sorted literal order
        assert all(len(c) == 8 for c in cents)
    codes = pq_encode(emb, "vec_id", "embedding", books, 64)
    a = {r.neighbor_id: tuple(r[f"code_{m}"] for m in range(8))
         for r in codes.collect()}
    b = {r.neighbor_id: tuple(r[f"code_{m}"] for m in range(8))
         for r in pq_encode(emb.repartition(13), "vec_id",
                            "embedding", books, 64).collect()}
    assert a == b
    valid = [set(ids) for ids, _ in books]
    for code in a.values():
        assert all(code[m] in valid[m] for m in range(8))
