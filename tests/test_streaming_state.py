"""applyInPandasWithState streaming dedup — cross-micro-batch state."""

from __future__ import annotations

from lacspark.spark.streaming import streaming_dedup


def _await_drained(q, total_rows, timeout=180):
    """Wait until the availableNow run has drained its DATA batches.

    With ProcessingTimeTimeout armed the query never terminates on its
    own (pending TTL timers keep no-data micro-batches coming —
    streaming_dedup docstring), so waiting the full timeout wastes
    wall-clock: return once ALL ``total_rows`` input rows have been
    processed AND the newest micro-batch was empty (the trailing empty
    batch proves the last data batch committed to the sink).
    """
    import time

    t0 = time.time()
    while time.time() - t0 < timeout:
        if q.awaitTermination(2):
            return
        prog = q.recentProgress
        if (prog and sum(p["numInputRows"] for p in prog) >= total_rows
                and prog[-1]["numInputRows"] == 0):
            return
    # fail LOUD: falling through would let the caller stop a
    # mid-flight query and assert on a partial sink (confusing data
    # failure, or a false pass).  Note recentProgress is a ~100-entry
    # ring buffer — with vastly more no-data batches than that before
    # drain, the sum undercounts and this raises; that scenario is
    # itself the timer-zombie regression we want surfaced.
    q.stop()
    raise TimeoutError(
        f"stream did not drain {total_rows} rows in {timeout}s "
        f"(recentProgress: {[p['numInputRows'] for p in q.recentProgress]})")


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: two sources, one dup inside the batch
    spark.createDataFrame(
        [("a", "hello world"), ("a", "HELLO   world"), ("b", "hello world")],
        "source string, text string").write.parquet(src + "/b1")
    # batch 2 (separate file → separate micro-batch): repeats + fresh
    spark.createDataFrame(
        [("a", "hello world"), ("a", "fresh row"), ("b", "also fresh")],
        "source string, text string").write.parquet(src + "/b2")

    stream = (spark.readStream
              .schema("source string, text string")
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/*"))
    deduped = streaming_dedup(stream, "source", "text")
    q = (deduped.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    _await_drained(q, total_rows=6)
    q.stop()  # kill the TTL-timer zombie; data batches are committed

    rows = [(r.source, r.text, r.fingerprint)
            for r in spark.read.parquet(out).collect()]
    # exactly one representative per (source, fingerprint): the
    # "hello world"/"HELLO   world" pair collapses within batch 1 and
    # the batch-2 repeat is dropped via cross-micro-batch state
    a_fps = [fp for s, _, fp in rows if s == "a"]
    assert len(a_fps) == 2 and len(set(a_fps)) == 2
    a_texts = {" ".join(t.lower().split()) for s, t, _ in rows if s == "a"}
    assert a_texts == {"hello world", "fresh row"}
    b_texts = {" ".join(t.lower().split()) for s, t, _ in rows if s == "b"}
    assert b_texts == {"hello world", "also fresh"}


def test_streaming_dedup_state_is_bounded(spark, tmp_path):
    """Per-key state is capped FIFO: feeding more distinct rows than
    the cap keeps only the newest fingerprints, so an evicted (oldest)
    fingerprint re-emits while a retained one is still deduped —
    bounded state store, graceful approximate dedup past the cap."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch1 = [("k", f"row number {i}") for i in range(5)]
    spark.createDataFrame(batch1, "source string, text string") \
        .coalesce(1).write.parquet(src + "/b1")
    # row 0 was evicted (cap 3 keeps rows 2,3,4); row 4 was retained
    spark.createDataFrame([("k", "row number 0"), ("k", "row number 4")],
                          "source string, text string") \
        .coalesce(1).write.parquet(src + "/b2")

    stream = (spark.readStream
              .schema("source string, text string")
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/*"))
    deduped = streaming_dedup(stream, "source", "text",
                              max_state_fingerprints=3)
    q = (deduped.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    _await_drained(q, total_rows=7)
    q.stop()  # same zombie-timer rationale as above

    texts = [r.text for r in spark.read.parquet(out).collect()]
    assert sorted(texts).count("row number 0") == 2  # evicted → re-emitted
    assert sorted(texts).count("row number 4") == 1  # retained → deduped
    assert len(texts) == 6  # 5 from batch 1 + the one re-emission


def test_streaming_dedup_no_ttl_terminates(spark, tmp_path):
    """Regression pin for the timer-zombie bug: with TTL disabled
    (timeout_minutes=None -> NoTimeout) an availableNow replay must
    TERMINATE once the data is drained — no pending processing-time
    timers, no no-data micro-batch loop (with TTL armed the same
    query spins ~770 empty batches toward the 60-minute mark)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("a", "hello world"), ("a", "HELLO   world"), ("b", "x")],
        "source string, text string").write.parquet(src + "/b1")

    stream = (spark.readStream
              .schema("source string, text string")
              .parquet(src + "/*"))
    deduped = streaming_dedup(stream, "source", "text",
                              timeout_minutes=None)
    q = (deduped.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    terminated = q.awaitTermination(120)
    assert terminated, "availableNow query with NoTimeout must stop"
    texts = {" ".join(r.text.lower().split())
             for r in spark.read.parquet(out).collect()}
    assert texts == {"hello world", "x"}
