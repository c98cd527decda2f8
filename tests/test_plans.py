"""Physical-plan regression guards: the properties that make these
queries scale must stay visible in the plan (predicate pushdown,
column pruning, broadcast joins, partial aggregation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lacspark.queries import SPARK_QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tagger_scan_prunes_and_pushes(spark):
    from lacspark.spark.tagger import tag_and_extract

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tagged = tag_and_extract(
        docs.select("doc_id", "text").filter("doc_id % 3 = 0"), "text")
    plan = plan_of(tagged)
    scan = [ln for ln in plan.splitlines() if "Scan parquet" in ln
            or "FileScan parquet" in ln][0]
    # only the two needed columns reach the scan; the filter reaches
    # the data source
    assert "doc_id" in scan and "text" in scan
    assert "lang" not in scan and "source" not in scan
    assert "PushedFilters" in plan or "DataFilters" in scan


def test_dimension_joins_broadcast(spark):
    plan = plan_of(SPARK_QUERIES["orders_by_nation"](spark, SF))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_aggregates_are_partial_final(spark):
    plan = plan_of(SPARK_QUERIES["tpch_q1_pricing"](spark, SF))
    assert "partial_sum" in plan  # map-side combine before the shuffle


def test_ivf_assignment_is_shuffle_free(spark):
    """The IVF nearest-list assignment must stay a pure projection:
    codebook as literal, scores/argmax inside the same project — no
    Exchange, no Join before the final candidate equi-join."""
    from lacspark.spark.similarity import (_nearest_lists, _with_norm,
                                           collect_codebook)
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    cb = collect_codebook(e, "embedding", "label", 64)
    assign = _nearest_lists(_with_norm(e, "vec_id", "embedding", "n"),
                            cb, "n", nprobe=1)
    plan = plan_of(assign)
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_keep_best_scans_documents_bounded(spark):
    """dedup_near_keep_best symmetrizes pairs with ONE explode; a
    union formulation re-executes the whole minhash DAG per branch
    (visible as extra parquet scans of documents)."""
    def scans(name):
        plan = plan_of(SPARK_QUERIES[name](spark, SF))
        return sum(1 for ln in plan.splitlines()
                   if "Scan parquet" in ln or "FileScan parquet" in ln)

    # keep-best = the minhash DAG once + exactly two length lookups;
    # a union symmetrization would duplicate the whole upstream DAG
    assert scans("dedup_near_keep_best") <= scans("dedup_minhash_lsh") + 2


def test_no_cartesian_products_in_oracle_suite(spark):
    # ann_bruteforce intentionally cross-joins a 10-row query set;
    # everything else must stay free of cartesian products
    for name, fn in SPARK_QUERIES.items():
        if name.startswith(("ann_bruteforce", "lac_", "kg_",
                            "mention_salience", "multimodal",
                            "ann_lsh_topk")):
            continue
        plan = plan_of(fn(spark, SF))
        assert "CartesianProduct" not in plan, name


def test_exact_pairs_single_shuffle_no_join(spark):
    """Keeper-form exact pairs must stay one window over the content
    hash: exactly one keyed Exchange, no self-join anywhere."""
    plan = plan_of(SPARK_QUERIES["dedup_exact_pairs"](spark, SF))
    assert "Join" not in plan
    assert plan.lower().count("exchange hashpartitioning") == 1


def test_embedding_multiband_no_cartesian_and_capped(spark):
    """Multi-band embedding LSH: candidates come from an equi-join on
    (band, code) — never a cartesian product — and the degenerate-
    bucket cap's window sits before the join."""
    plan = plan_of(SPARK_QUERIES["dedup_embedding_cosine"](spark, SF))
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert "Window" in plan  # the max_bucket count filter


def test_kmeans_ivf_assignment_is_shuffle_free(spark):
    """The k-means codebook path keeps IVF assignment a pure
    projection: codebook as literal, argmax inside the project — no
    Exchange, no Join before the candidate equi-join."""
    from lacspark.spark.similarity import (_nearest_lists, _with_norm,
                                           kmeans_codebook)
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    cb = kmeans_codebook(e, "vec_id", "embedding", 64,
                         n_lists=16, iters=2, memo_key=SF)
    assign = _nearest_lists(_with_norm(e, "vec_id", "embedding", "n"),
                            cb, "n", nprobe=1)
    plan = plan_of(assign)
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_repetition_stats_is_shuffle_free(spark):
    """The Gopher repetition fractions are a fold over per-row arrays:
    no keyed shuffle may appear (the relational formulation would
    shuffle one row per gram).  Round-robin widening of the tiny
    parquet input is the only allowed Exchange."""
    plan = plan_of(SPARK_QUERIES["quality_repetition"](spark, SF)).lower()
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan


def test_token_count_bpe_is_arrow_and_shuffle_free(spark):
    """Subword counting is a stateless Arrow-batched projection:
    no keyed shuffle, and the python eval must be Arrow (pandas_udf),
    never row-at-a-time BatchEvalPython."""
    plan = plan_of(SPARK_QUERIES["token_count_bpe"](spark, SF)).lower()
    assert "hashpartitioning" not in plan
    assert "arrowevalpython" in plan
    assert "batchevalpython" not in plan


def test_substring_spans_minimal_shuffles(spark):
    """Three keyed shuffles is the floor for the span operator (df-cap
    window by fingerprint, cross-doc fingerprint join, diagonal
    run-merge window); the groupBy after the run window must reuse
    the window's (d1, d2, diag) distribution instead of adding a
    fourth."""
    plan = plan_of(
        SPARK_QUERIES["dedup_substring_spans"](spark, SF)).lower()
    assert plan.count("hashpartitioning") <= 3
    assert "cartesianproduct" not in plan


def test_lm_score_broadcasts_and_single_shuffle(spark):
    """The LM table is dictionary-shaped: both lookups must be
    broadcast hash joins (never sort-merge), leaving the per-doc
    aggregate as the only keyed shuffle, with map-side partials."""
    plan = plan_of(SPARK_QUERIES["quality_lm_score"](spark, SF)).lower()
    assert plan.count("broadcasthashjoin") == 2
    assert "sortmergejoin" not in plan
    assert plan.count("hashpartitioning") == 1


def test_pq_encode_is_pure_projection(spark):
    """PQ corpus encoding (the compressed form the ADC scan reads)
    must be a zero-shuffle projection — codebooks ride as literals
    (≙ broadcast), assignments are per-row argmins."""
    from lacspark.spark.similarity import pq_codebooks, pq_encode

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    books = pq_codebooks(emb, "vec_id", "embedding", 64,
                         m=8, k=32, iters=2, memo_key=SF)
    plan = plan_of(pq_encode(emb, "vec_id", "embedding",
                             books, 64)).lower()
    assert "hashpartitioning" not in plan
    assert "python" not in plan  # all JVM-side expressions
