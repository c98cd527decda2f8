"""File-level KG extraction operator over the repos_files corpus.

Input shape (BASELINE input_hint): ``repos_files(repo, path, commit,
lang, content)``.  One fused ``mapInPandas`` stage per file row:
split content into lines (K1), run the engine over ALL lines of the
Arrow batch as one flat ragged batch (maximum amortization — the
line/file boundary is metadata, not a batch boundary), extract
mentions + triples per line (K3/K4), and verify the per-row sha256
invariant *inside the UDF*: the engine guarantees
``''.join(words) == line`` per line, and the reassembled
``'\\n'.join(lines)`` is hashed and compared against
``sha2(content, 256)`` computed JVM-side — no extra shuffle for the
integrity gate (SURVEY §2.2 K1's regroup-check, optimized away).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .tagger import MENTION_FIELDS, TRIPLE_FIELDS, _worker_engine

FILE_KEYS = ["repo", "path", "commit", "lang"]

SENT_MENTION_FIELDS = T.StructType(
    [T.StructField("sent_id", T.IntegerType())] + list(MENTION_FIELDS.fields))
SENT_TRIPLE_FIELDS = T.StructType(
    [T.StructField("sent_id", T.IntegerType())] + list(TRIPLE_FIELDS.fields))

FILE_OUTPUT_FIELDS = [
    T.StructField("n_lines", T.IntegerType()),
    T.StructField("n_tokens", T.IntegerType()),
    T.StructField("sha_ok", T.BooleanType()),
    T.StructField("mentions", T.ArrayType(SENT_MENTION_FIELDS)),
    T.StructField("triples", T.ArrayType(SENT_TRIPLE_FIELDS)),
]


def tag_files(df: DataFrame, content_col: str = "content",
              sha_col: str = "content_sha256",
              mode: str = "rank",
              custom_lines: tuple[str, ...] = (),
              use_automaton: bool = False,
              triple_window: int = 8,
              auto_repartition: bool = True) -> DataFrame:
    """K1+K2+K3+K4 fused over whole-file rows.

    Requires ``sha_col`` (add with ``F.sha2(content, 256)`` at scan
    time so the hash of the *source bytes* is fixed before any python
    touches the row).
    """
    if auto_repartition:
        from .tagger import ensure_parallelism
        df = ensure_parallelism(df)
    out_schema = T.StructType(list(df.schema.fields) + FILE_OUTPUT_FIELDS)
    custom_lines = tuple(custom_lines)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        eng = _worker_engine(custom_lines, use_automaton)
        for pdf in batches:
            contents = ["" if c is None else str(c) for c in pdf[content_col]]
            shas = list(pdf[sha_col])
            per_file_lines = [c.split("\n") for c in contents]
            flat = [ln for lines in per_file_lines for ln in lines]
            results = eng.run_batch(flat, mode=mode)

            n_lines_col, n_tokens_col, sha_ok_col = [], [], []
            mentions_col, triples_col = [], []
            cursor = 0
            for lines, content, sha in zip(per_file_lines, contents, shas):
                rows = results[cursor:cursor + len(lines)]
                cursor += len(lines)
                rebuilt = "\n".join("".join(r.words) for r in rows)
                digest = hashlib.sha256(rebuilt.encode("utf-8")).hexdigest()
                sha_ok_col.append(digest == sha)
                n_lines_col.append(len(lines))
                n_tokens_col.append(sum(len(r.words) for r in rows))
                f_mentions, f_triples = [], []
                for sent_id, r in enumerate(rows):
                    m, t3 = eng.extract(r, window=triple_window)
                    f_mentions.extend((sent_id, *x) for x in m)
                    f_triples.extend((sent_id, *x) for x in t3)
                mentions_col.append(f_mentions)
                triples_col.append(f_triples)

            pdf = pdf.copy()
            pdf["n_lines"] = n_lines_col
            pdf["n_tokens"] = n_tokens_col
            pdf["sha_ok"] = sha_ok_col
            pdf["mentions"] = mentions_col
            pdf["triples"] = triples_col
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def file_mentions(tagged: DataFrame, keys: list[str] | None = None) -> DataFrame:
    keys = keys or FILE_KEYS
    m = tagged.select(*keys, F.explode("mentions").alias("m"))
    return m.select(*keys, "m.sent_id", "m.word", "m.tag", "m.rank",
                    "m.word_idx", "m.char_begin")


def file_triples(tagged: DataFrame, keys: list[str] | None = None) -> DataFrame:
    keys = keys or FILE_KEYS
    t = tagged.select(*keys, F.explode("triples").alias("t"))
    return t.select(*keys, "t.sent_id", "t.subj", "t.pred", "t.obj",
                    "t.conf", "t.sal")


def mention_salience_topk(mentions: DataFrame, keys: list[str],
                          k: int = 10) -> DataFrame:
    """K5: per-document top-k mentions by rank then frequency
    (LAC word-importance as mention salience)."""
    from pyspark.sql.window import Window

    agg = (mentions.groupBy(*keys, "word")
           .agg(F.max("rank").alias("max_rank"),
                F.count(F.lit(1)).alias("freq")))
    w = Window.partitionBy(*keys).orderBy(
        F.desc("max_rank"), F.desc("freq"), F.asc("word"))
    return (agg.withColumn("salience_rank", F.row_number().over(w))
            .filter(F.col("salience_rank") <= k))
