"""Scan-boundary ingest helpers (O24: encoding config).

Spark strings are UTF-8; a corpus stored in another encoding decodes
once at the scan boundary.  Spark 4's builtin ``decode`` only accepts
a small charset whitelist, so anything else (GB18030, the reference's
other supported encoding — c++/include/lac.h:24-29) goes through an
Arrow-batched python decode (zero-copy binary in, one pass)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SPARK_NATIVE = {"iso-8859-1", "us-ascii", "utf-16", "utf-16be",
                 "utf-16le", "utf-32", "utf-8"}


def decode_text(df: DataFrame, raw_col: str, out_col: str = "text",
                charset: str = "utf-8",
                errors: str = "replace") -> DataFrame:
    cs = charset.lower()
    if cs in _SPARK_NATIVE:
        return df.withColumn(out_col, F.decode(raw_col, charset))

    out_schema = T.StructType(list(df.schema.fields)
                              + [T.StructField(out_col, T.StringType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                (bytes(v).decode(charset, errors) if v is not None else None)
                for v in pdf[raw_col]]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
