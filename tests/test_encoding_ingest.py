"""O24: non-UTF-8 ingest — GB18030 bytes decoded at scan time.

Spark strings are UTF-8; the reference's GB18030 mode
(c++/include/lac.h:24-29, lac_util.cpp:131-151) maps to decoding the
byte column at the scan boundary, after which the engine sees normal
unicode."""

from __future__ import annotations

from lacspark.engine import LacEngine
from lacspark.spark.ingest import decode_text
from lacspark.spark.tagger import tag_and_extract

TEXTS = ["百度是一家高科技公司", "数据分析 spark join", "春天的花开"]


def test_gb18030_decode_then_tag(spark):
    rows = [(i, t.encode("gb18030")) for i, t in enumerate(TEXTS)]
    df = spark.createDataFrame(rows, "doc_id long, raw binary")
    decoded = decode_text(df, "raw", "text", charset="GB18030")
    # decode is exact
    assert [r.text for r in decoded.orderBy("doc_id").collect()] == TEXTS
    tagged = tag_and_extract(decoded, "text", mode="lac",
                             with_extraction=False)
    got = {r.doc_id: (list(r.words), list(r.tags))
           for r in tagged.collect()}
    oracle = LacEngine().run_batch(TEXTS, "lac")
    for i, o in enumerate(oracle):
        assert got[i] == (o.words, o.tags)
