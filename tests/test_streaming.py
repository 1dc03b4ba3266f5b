"""Structured Streaming tests (SURVEY §2.8 T1-T10, §5 streaming plan).

Deterministic harness: file-source stream over the events parquet,
AvailableNow trigger, memory sink — the MemoryStream-style pattern.
Each streaming result is checked against its batch equivalent on the
same data (streams and batches share one logical plan in Spark, so
equality here is a real end-to-end check of the incremental engine).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatalab_spark.sources import load_table
from bigdatalab_spark.streaming import (
    run_stream_to_memory,
    stream_events,
    windowed_counts,
)
from bigdatalab_spark.streaming.jobs import (
    cumulative_counts,
    sentiment_style_state,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cumulative_counts_match_batch(spark, sf_dir):
    """T5 updateStateByKey — final state == batch groupBy on same data."""
    stream = cumulative_counts(stream_events(spark, sf_dir)).drop("total_value")
    run_stream_to_memory(stream, "t_cumulative")
    got = _rows(spark.table("t_cumulative"))
    want = _rows(
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("total_events"))
    )
    assert got == want and len(got) > 0


def test_state_shuffle_partitions_derivation(spark):
    """Keyspace-derived state partitioning: bounded by expected keys
    below the configured parallelism, by the configured parallelism
    above it, floored at 1 — and never derived from the host."""
    from bigdatalab_spark.streaming.jobs import state_shuffle_partitions

    conf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert state_shuffle_partitions(spark, 1) == 1
    assert state_shuffle_partitions(spark, 5) == min(5, conf)
    assert state_shuffle_partitions(spark, 10**9) == conf


def test_state_partitions_for_bytes_derivation(spark):
    """Input-size-derived state partitioning for data-sized keyspaces:
    AQE's advisory partition size applied ahead of the (pinned)
    stateful exchange — floored at the small fsync-overlap constant,
    capped by the configured parallelism, never derived from the
    host."""
    from bigdatalab_spark.streaming.jobs import (
        STATE_ADVISORY_BYTES,
        STATE_MIN_PARTITIONS,
        state_partitions_for_bytes,
    )

    conf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    floor = min(max(STATE_MIN_PARTITIONS, 1), conf)
    # tiny drains get the floor, not one store per configured partition
    assert state_partitions_for_bytes(spark, 1) == floor
    assert state_partitions_for_bytes(spark, 2 << 20) == floor
    # past the advisory size the count scales with the data…
    want = -(-(50 * STATE_ADVISORY_BYTES) // STATE_ADVISORY_BYTES)
    assert state_partitions_for_bytes(
        spark, 50 * STATE_ADVISORY_BYTES
    ) == min(want, conf)
    # …and the configured parallelism stays the ceiling (the
    # cluster-scaled knob)
    assert state_partitions_for_bytes(spark, 1 << 50) == conf


def test_expected_keys_state_matches_batch_and_restores_conf(spark, sf_dir):
    """A keyed stream drained with expected_keys set produces the same
    final state as the batch twin, and the session's shuffle-partition
    conf is restored after the drain."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    stream = cumulative_counts(stream_events(spark, sf_dir)).drop("total_value")
    run_stream_to_memory(stream, "t_cumulative_keyed", expected_keys=8)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    got = _rows(spark.table("t_cumulative_keyed"))
    want = _rows(
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("total_events"))
    )
    assert got == want and len(got) > 0


def test_windowed_counts_match_batch(spark, sf_dir):
    """T7 sliding window + T8 watermark."""
    stream = windowed_counts(
        stream_events(spark, sf_dir), window="2 days", slide="1 day"
    ).drop("sum_value")
    run_stream_to_memory(stream, "t_windowed")
    got = _rows(spark.table("t_windowed"))
    events = load_table(spark, sf_dir, "events")
    want = _rows(
        events.groupBy(F.window("ts", "2 days", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("string").alias("window_start"), "event_type", "n"
        )
    )
    assert got == want and len(got) > 0


def test_multifield_state_matches_batch(spark, sf_dir):
    """T6 custom (count,sum,avg) state tuple == streaming agg."""
    stream = sentiment_style_state(stream_events(spark, sf_dir))
    run_stream_to_memory(stream, "t_state")
    got = spark.table("t_state")
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.avg("value").alias("avg_value"),
        )
    )
    g = {r["user_id"]: r for r in got.collect()}
    w = {r["user_id"]: r for r in want.collect()}
    assert set(g) == set(w)
    for uid in w:
        assert g[uid]["n_events"] == w[uid]["n_events"]
        assert g[uid]["sum_value"] == pytest.approx(w[uid]["sum_value"], rel=1e-9)
        assert g[uid]["avg_value"] == pytest.approx(w[uid]["avg_value"], rel=1e-9)


def test_checkpoint_restart(spark, sf_dir, tmp_path):
    """T4: checkpointed stream recovers and does NOT reprocess drained
    input (StreamingContext.getOrCreate semantics, ExerciseNetcat.scala:74-78)."""
    ckpt = str(tmp_path / "ckpt")
    stream = cumulative_counts(stream_events(spark, sf_dir)).drop("total_value")
    run_stream_to_memory(stream, "t_ckpt_a", checkpoint_dir=ckpt)
    first = _rows(spark.table("t_ckpt_a"))
    assert len(first) > 0
    # restart from the same checkpoint: all files already committed ->
    # no new micro-batch -> memory sink for the new run stays empty
    stream2 = cumulative_counts(stream_events(spark, sf_dir)).drop("total_value")
    run_stream_to_memory(stream2, "t_ckpt_b", checkpoint_dir=ckpt)
    assert _rows(spark.table("t_ckpt_b")) == []


def test_foreachbatch_per_batch_count(spark, sf_dir):
    """T2/T3: per-batch processing (the DStream per-RDD semantics) via
    foreachBatch — counts per micro-batch, sorted desc like the
    reference's transform(sortByKey(false))."""
    batches: list[list] = []

    def sink(batch_df, batch_id):
        batches.append(
            batch_df.groupBy("event_type")
            .count()
            .orderBy(F.desc("count"), "event_type")
            .collect()
        )

    q = (
        stream_events(spark, sf_dir)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    total = sum(r["count"] for b in batches for r in b)
    assert total == load_table(spark, sf_dir, "events").count()
    for b in batches:  # desc order within each batch
        counts = [r["count"] for r in b]
        assert counts == sorted(counts, reverse=True)


def test_apply_in_pandas_with_state_ewma(spark, sf_dir):
    """T5/T6 general case: arbitrary keyed state via
    applyInPandasWithState — final state equals the batch reference
    implementation on the same (single-file => single-batch) input."""
    from bigdatalab_spark.streaming.stateful import ewma_per_user, ewma_per_user_batch

    stream = ewma_per_user(stream_events(spark, sf_dir).filter("user_id < 8"))
    run_stream_to_memory(stream, "t_ewma", output_mode="update")
    got = {r.user_id: r for r in spark.table("t_ewma").collect()}
    want = ewma_per_user_batch(
        load_table(spark, sf_dir, "events").filter("user_id < 8")
    )
    assert set(got) == set(want.user_id)
    for _, w in want.iterrows():
        g = got[w.user_id]
        assert g.n_events == w.n_events
        assert g.ewma_value == pytest.approx(w.ewma_value, rel=1e-12)


def test_socket_stream_live(spark):
    """S12: live socket text source — a real netcat-style server feeds
    lines to readStream.format('socket'); word counts arrive in the
    memory sink (ExerciseNetcat word count, T2)."""
    import socket
    import threading
    import time

    from bigdatalab_spark.streaming import socket_stream

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    srv.listen(1)

    def serve():
        conn, _ = srv.accept()
        with conn:
            conn.sendall(b"sopra la panca la capra campa\n" * 3)
            time.sleep(8)  # keep the connection open while batches run

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    lines = socket_stream(spark, "127.0.0.1", port)
    counts = (
        lines.select(F.explode(F.split("value", " ")).alias("word"))
        .groupBy("word")
        .count()
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("t_socket")
        .outputMode("complete")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 30
        got = {}
        while time.time() < deadline:
            got = {r.word: r["count"] for r in spark.table("t_socket").collect()}
            if got.get("la", 0) >= 6:
                break
            time.sleep(0.5)
        assert got.get("la") == 6 and got.get("sopra") == 3, got
    finally:
        q.stop()
        srv.close()


def test_console_sink_runs(spark, sf_dir):
    """K7: console sink drains without error (output goes to stdout)."""
    from bigdatalab_spark.streaming.jobs import cumulative_counts, run_stream_to_console

    q = run_stream_to_console(
        cumulative_counts(stream_events(spark, sf_dir)).drop("total_value")
    )
    q.awaitTermination()
    assert q.lastProgress is not None


@pytest.mark.slow
def test_watermark_drops_late_rows(spark, tmp_path):
    """T8: with a watermark, an event older than (max_event_time -
    watermark) arriving in a LATER micro-batch is dropped from the
    aggregation — the late-data policy DStreams could not express.

    One streaming run, maxFilesPerTrigger=1: the on-time file advances
    the watermark to 11:00 in batch 1; the late file's 09:00 row arrives
    in batch 2 and must be discarded.
    """
    import os
    import time

    import pyspark.sql.functions as F
    from pyspark.sql.types import StringType, StructField, StructType, TimestampType

    src = tmp_path / "late_src"
    src.mkdir()
    schema = StructType(
        [StructField("ts", TimestampType()), StructField("k", StringType())]
    )
    def w(path, rows):
        spark.createDataFrame(rows, "ts string, k string").select(
            F.col("ts").cast("timestamp"), "k"
        ).coalesce(1).write.parquet(str(path))

    # Three micro-batches (file mtime order): the LATE-EVENTS watermark is
    # the PREVIOUS batch's eviction watermark (it lags one batch — Spark
    # 3.4+ dual-watermark model for multi-stateful-operator support), so
    # the late row must arrive two batches after the on-time data to be
    # provably below the filter.
    w(src / "f1", [("2024-01-01 10:00:00", "a"), ("2024-01-01 12:00:00", "a")])
    time.sleep(1.1)  # file-source orders batches by modification time
    w(src / "f2", [("2024-01-01 12:30:00", "a")])
    time.sleep(1.1)
    w(src / "f3", [("2024-01-01 09:00:00", "a")])  # 3h+ older than max seen

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src / "*"))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("string").alias("ws"), "k", "n")
    )
    # APPEND mode: watermark semantics are enforced — late rows below the
    # late-events watermark are dropped and counted.
    q = (
        agg.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped == 1  # exactly the 09:00 row
    counts = {r.ws: r.n for r in spark.table("t_late").collect()}
    # only the finalized 10:00 window emitted (12:00/12:30 still open);
    # the late 09:00 window never materialized
    assert counts == {"2024-01-01 10:00:00": 1}, counts


def test_stream_stream_interval_join(spark, sf_dir):
    """Stream-stream inner join (clicks x purchases within 1 h per user)
    equals the batch interval join on the same data."""
    from bigdatalab_spark.streaming.jobs import stream_stream_interval_join

    ev = stream_events(spark, sf_dir)
    clicks = ev.filter("event_type = 'click'")
    purchases = ev.filter("event_type = 'purchase'")
    joined = stream_stream_interval_join(clicks, purchases)
    run_stream_to_memory(joined, "t_ssj", output_mode="append")
    got = _rows(spark.table("t_ssj"))

    bev = load_table(spark, sf_dir, "events")
    bc = bev.filter("event_type = 'click'").alias("c")
    bp = bev.filter("event_type = 'purchase'").alias("p")
    want = _rows(
        bc.join(
            bp,
            F.expr(
                "c.user_id = p.user_id AND p.ts > c.ts "
                "AND p.ts <= c.ts + INTERVAL 1 HOUR"
            ),
        ).select(
            F.col("c.user_id").alias("user_id"),
            F.col("c.event_id").alias("click_id"),
            F.col("p.event_id").alias("purchase_id"),
            F.col("c.ts").alias("click_ts"),
            F.col("p.ts").alias("purchase_ts"),
        )
    )
    assert got == want and len(got) > 0


def test_processing_time_window_counts(spark, sf_dir):
    """T7 letter-of-semantics (ExerciseNetcat.scala:117 processing-time
    window): a processingTime trigger delivers one wall-clock window of
    arrivals per micro-batch; the per-batch aggregate is the windowed
    count. Totals across windows must equal the batch table."""
    import time as _time

    from bigdatalab_spark.streaming import processing_time_window_counts

    windows: list[tuple[int, list]] = []

    def on_batch(counts_df, batch_id):
        windows.append((batch_id, counts_df.collect()))

    q = processing_time_window_counts(
        stream_events(spark, sf_dir), trigger="1 seconds", on_batch=on_batch
    )
    deadline = _time.time() + 60
    while _time.time() < deadline and not windows:
        _time.sleep(0.5)
    q.stop()
    q.awaitTermination()
    assert windows, "no processing-time window fired within 60s"
    total = sum(r["n"] for _, rows in windows for r in rows)
    assert total == load_table(spark, sf_dir, "events").count()
    for _, rows in windows:  # desc order within each window
        ns = [r["n"] for r in rows]
        assert ns == sorted(ns, reverse=True)


@pytest.mark.slow
def test_streaming_session_windows_close_on_watermark(spark, tmp_path):
    """T9 streaming twin: session_window under readStream + watermark.
    A session is emitted (append mode) once the watermark passes its
    end (last event + gap); a newer session still within the gap of the
    stream head stays open and is NOT emitted."""
    import time

    import pyspark.sql.functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    src = tmp_path / "sess_src"
    src.mkdir()
    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("k", StringType()),
        ]
    )

    def w(path, rows):
        spark.createDataFrame(rows, "ts string, user_id long, k string").select(
            F.col("ts").cast("timestamp"), "user_id", "k"
        ).coalesce(1).write.parquet(str(path))

    # user 1: two events 30 min apart on day 1 -> ONE session, closed
    # long before the stream head. user 2: one event near the head ->
    # session still open at termination.
    w(
        src / "f1",
        [
            ("2024-01-01 10:00:00", 1, "a"),
            ("2024-01-01 10:30:00", 1, "a"),
        ],
    )
    time.sleep(1.1)
    w(src / "f2", [("2024-01-05 10:00:00", 2, "a")])
    time.sleep(1.1)
    # a third file two batches later pushes the (lagging) eviction
    # watermark firmly past user 1's session end (dual-watermark model)
    w(src / "f3", [("2024-01-06 10:00:00", 2, "a")])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src / "*"))
    )
    sess = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "2 hours").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("string").alias("session_start"),
            "n_events",
        )
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("t_sess_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in spark.table("t_sess_stream").collect()
    }
    # user 1's merged 2-event session emitted; user 2's sessions at the
    # stream head may or may not have closed (watermark lag) — assert
    # the closed session exactly and no phantom user-1 sessions
    assert (1, "2024-01-01 10:00:00", 2) in got
    assert all(u != 1 or s == "2024-01-01 10:00:00" for u, s, _ in got)
    # batch twin over the same files merges the same session
    batch = (
        spark.read.schema(schema)
        .parquet(str(src / "*"))
        .groupBy(F.session_window("ts", "2 hours").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").cast("string").alias("session_start"), "n_events")
    )
    want_user1 = {
        (r.user_id, r.session_start, r.n_events)
        for r in batch.filter("user_id = 1").collect()
    }
    assert want_user1 == {(1, "2024-01-01 10:00:00", 2)}


def test_drop_duplicates_within_watermark_bounds_state(spark, tmp_path):
    """Scale-critical streaming dedup variant: dropDuplicatesWithinWatermark
    keeps dedup state only for the watermark horizon (bounded state at
    100 TB/day ingest, vs dropDuplicates' unbounded key set). Within the
    horizon duplicates are suppressed; a duplicate arriving after the
    watermark passed its first occurrence may re-emit — the documented
    tradeoff."""
    import time

    import pyspark.sql.functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType, TimestampType

    src = tmp_path / "dedup_src"
    src.mkdir()
    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("event_key", StringType()),
            StructField("user_id", LongType()),
        ]
    )

    def w(path, rows):
        spark.createDataFrame(rows, "ts string, event_key string, user_id long").select(
            F.col("ts").cast("timestamp"), "event_key", "user_id"
        ).coalesce(1).write.parquet(str(path))

    # batch 1: k1 twice (in-batch dup) + k2; batch 2: k1 again within
    # the 1h horizon -> suppressed
    w(
        src / "f1",
        [
            ("2024-01-01 10:00:00", "k1", 1),
            ("2024-01-01 10:05:00", "k1", 1),
            ("2024-01-01 10:10:00", "k2", 2),
        ],
    )
    time.sleep(1.1)
    w(src / "f2", [("2024-01-01 10:20:00", "k1", 1)])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src / "*"))
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_key"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    keys = [r.event_key for r in spark.table("t_dedup_wm").collect()]
    assert sorted(keys) == ["k1", "k2"]  # each key exactly once


def test_rocksdb_state_store_is_the_session_default(spark):
    """The session factory pins RocksDB-backed streaming state (bounded
    executor memory at 100 TB key spaces); the whole streaming suite —
    including checkpoint restart and watermark dedup — runs under it."""
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        .endswith("RocksDBStateStoreProvider")
    )


def test_stream_stream_left_outer_join_eviction_frontier(spark, sf_dir):
    """Left-outer stream-stream join: matched rows equal the inner join;
    null-extended rows are exactly the unmatched clicks old enough that
    the watermark proved no purchase can still arrive; younger
    unmatched clicks are (correctly) withheld."""
    from bigdatalab_spark.streaming.jobs import stream_stream_interval_join

    ev = stream_events(spark, sf_dir)
    clicks = ev.filter("event_type = 'click'")
    purchases = ev.filter("event_type = 'purchase'")
    outer = stream_stream_interval_join(clicks, purchases, how="left_outer")
    run_stream_to_memory(outer, "t_ssj_outer", output_mode="append")
    got = spark.table("t_ssj_outer").collect()

    matched = {(r["click_id"], r["purchase_id"]) for r in got if r["purchase_id"] is not None}
    nulls = {r["click_id"] for r in got if r["purchase_id"] is None}

    bev = load_table(spark, sf_dir, "events")
    bc = bev.filter("event_type = 'click'").alias("c")
    bp = bev.filter("event_type = 'purchase'").alias("p")
    cond = F.expr(
        "c.user_id = p.user_id AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR"
    )
    inner = {
        (r["click_id"], r["purchase_id"])
        for r in bc.join(bp, cond).select(
            F.col("c.event_id").alias("click_id"),
            F.col("p.event_id").alias("purchase_id"),
        ).collect()
    }
    assert matched == inner  # outer's matched half IS the inner join

    # eviction frontier: the global watermark is the MIN across both
    # input streams of (max event time - 2h delay); a click can be
    # null-emitted only once that watermark passes click_ts + 1h gap
    import datetime as _dt

    max_c = bev.filter("event_type = 'click'").agg(F.max("ts")).collect()[0][0]
    max_p = bev.filter("event_type = 'purchase'").agg(F.max("ts")).collect()[0][0]
    frontier = min(max_c, max_p) - _dt.timedelta(hours=2) - _dt.timedelta(hours=1)
    anti = {
        (r["event_id"], r["ts"])
        for r in bc.join(bp, cond, "left_anti")
        .select(F.col("c.event_id").alias("event_id"), F.col("c.ts").alias("ts"))
        .collect()
    }
    expected_nulls = {eid for eid, ts in anti if ts < frontier}
    withheld = {eid for eid, ts in anti if ts >= frontier}
    assert expected_nulls <= nulls  # everything provably unmatched emitted
    assert nulls.isdisjoint({cid for cid, _ in inner})  # no false nulls
    assert nulls <= expected_nulls | withheld  # nothing else appears


def test_foreachbatch_crash_restart_exactly_once(spark, sf_dir, tmp_path):
    """Fault injection: the first run crashes inside foreachBatch AFTER
    writing its output; the checkpoint restart must retry the batch and
    the idempotent (overwrite-by-batchId) sink must yield every input
    row exactly once — the standard exactly-once recipe for arbitrary
    sinks."""
    import os

    ckpt = str(tmp_path / "ckpt")
    out_root = tmp_path / "out"
    crash_flag = tmp_path / "crash_once"
    crash_flag.write_text("1")

    def sink(batch_df, batch_id):
        # idempotent: re-delivery of the same batch overwrites its own
        # directory instead of appending duplicates
        batch_df.write.mode("overwrite").parquet(str(out_root / f"batch={batch_id}"))
        if crash_flag.exists():
            os.remove(str(crash_flag))
            raise RuntimeError("injected failure after write, before commit")

    def start():
        return (
            stream_events(spark, sf_dir)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q1 = start()
    with pytest.raises(Exception, match="injected failure"):
        q1.awaitTermination()

    q2 = start()  # recover from the same checkpoint
    q2.awaitTermination()

    got = spark.read.parquet(str(out_root))
    want = load_table(spark, sf_dir, "events")
    assert got.count() == want.count()
    assert got.select("event_id").distinct().count() == want.count()


def test_streaming_observe_metrics_in_progress(spark, sf_dir):
    """df.observe on a STREAM: per-batch data-quality metrics arrive in
    StreamingQueryProgress.observedMetrics — the zero-extra-scan
    observability channel for running pipelines (batch twin:
    operators.observe)."""
    stream = stream_events(spark, sf_dir).observe(
        "gate_metrics",
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("user_id").isNull(), 1)).alias("n_null_user"),
    )
    q = (
        stream.groupBy("event_type")
        .count()
        .writeStream.format("memory")
        .queryName("t_observe_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = None
    for p in q.recentProgress:
        if "gate_metrics" in p["observedMetrics"]:
            m = p["observedMetrics"]["gate_metrics"]
            got = (m["n_rows"], m["n_null_user"])
    want = load_table(spark, sf_dir, "events").count()
    assert got == (want, 0), got


def test_rate_stream_source(spark):
    """Built-in rate source: a self-generating stream for load tests —
    monotonically increasing (timestamp, value) rows at rowsPerSecond."""
    import time

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 50)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_rate")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 20
        n = 0
        while time.time() < deadline:
            n = spark.table("t_rate").count()
            if n >= 50:
                break
            time.sleep(0.5)
        assert n >= 50, f"rate source produced only {n} rows"
        vals = [r["value"] for r in spark.table("t_rate").collect()]
        assert sorted(vals) == list(range(min(vals), min(vals) + len(vals)))
    finally:
        q.stop()


def test_transform_with_state_v2_plan_builds(spark, sf_dir):
    """Spark 4 state-v2 plan construction: the transformWithStateInPandas
    operator resolves against the events stream with the declared
    output schema. (Execution needs protobuf — absent in this sandbox;
    see stateful_v2 module note — so the drain test below self-gates.)"""
    from bigdatalab_spark.streaming.stateful_v2 import user_stats_v2

    stream = user_stats_v2(stream_events(spark, sf_dir).filter("user_id < 8"))
    assert stream.isStreaming
    assert [f.name for f in stream.schema.fields] == [
        "user_id", "n_events", "total_value", "n_types", "top_type",
    ]


def test_transform_with_state_v2_user_stats(spark, sf_dir):
    """Spark 4 state-v2 (transformWithStateInPandas over RocksDB):
    ValueState + MapState column families drain to exactly the batch
    reference — count, sum, distinct types, and deterministic top
    type per user. Runs wherever protobuf is available (the v2 state
    protocol needs it; this sandbox lacks it)."""
    pytest.importorskip("google.protobuf")
    from bigdatalab_spark.streaming.stateful_v2 import (
        user_stats_batch,
        user_stats_v2,
    )

    stream = user_stats_v2(stream_events(spark, sf_dir).filter("user_id < 8"))
    run_stream_to_memory(stream, "t_twsv2", output_mode="update")
    got = {r.user_id: r for r in spark.table("t_twsv2").collect()}
    want = user_stats_batch(
        load_table(spark, sf_dir, "events").filter("user_id < 8")
    )
    assert set(got) == set(want.user_id)
    for _, w in want.iterrows():
        g = got[w.user_id]
        assert g.n_events == w.n_events
        assert g.n_types == w.n_types
        assert g.top_type == w.top_type
        assert g.total_value == pytest.approx(w.total_value, rel=1e-12)


def test_apply_cdc_stream_merges_batches_idempotently(spark, tmp_path):
    """Streaming CDC apply: an update stream continuously MERGEs into a
    partitioned parquet table via foreachBatch — replace-by-key,
    insert-new, in-batch last-writer collapse, and a checkpoint restart
    with nothing new leaves the table byte-stable (idempotent merge =
    effectively exactly-once)."""
    from bigdatalab_spark.streaming.jobs import apply_cdc_stream

    target = str(tmp_path / "state")
    updates_dir = tmp_path / "updates"
    updates_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = "k LONG, day STRING, v DOUBLE, seq LONG"

    spark.createDataFrame(
        [(1, "d1", 10.0, 0), (2, "d1", 20.0, 0), (3, "d2", 30.0, 0)], schema
    ).write.partitionBy("day").parquet(target)

    def drain(rows):
        if rows:
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).json(str(updates_dir))
        stream = spark.readStream.schema(schema).json(str(updates_dir))
        q = apply_cdc_stream(
            stream, target, ("k",), ("day",), ckpt, order_col="seq"
        )
        q.awaitTermination(60)

    def state():
        return {
            r["k"]: (r["day"], r["v"])
            for r in spark.read.parquet(target).collect()
        }

    # batch 1: update k=1, insert k=4; k=2 appears twice -> seq=2 wins
    drain([(1, "d1", 11.0, 1), (4, "d2", 40.0, 1), (2, "d1", 21.0, 1), (2, "d1", 22.0, 2)])
    assert state() == {
        1: ("d1", 11.0),
        2: ("d1", 22.0),
        3: ("d2", 30.0),
        4: ("d2", 40.0),
    }

    # batch 2 (checkpoint resume skips batch 1's file): update k=3
    drain([(3, "d2", 33.0, 3)])
    assert state()[3] == ("d2", 33.0) and state()[1] == ("d1", 11.0)

    # restart with no new data: nothing rewritten
    before = state()
    drain([])
    assert state() == before


def test_apply_cdc_stream_out_of_order_batch_does_not_regress(spark, tmp_path):
    """A LATER micro-batch carrying an OLDER record (backfill / late
    file) must not regress state: order_col now flows into the merge
    itself, which keeps max(seq) between the stored row and the update
    instead of unconditionally replacing matched keys."""
    from bigdatalab_spark.streaming.jobs import apply_cdc_stream

    target = str(tmp_path / "state")
    updates_dir = tmp_path / "updates"
    updates_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = "k LONG, day STRING, v DOUBLE, seq LONG"

    spark.createDataFrame([(1, "d1", 10.0, 0)], schema).write.partitionBy(
        "day"
    ).parquet(target)

    def drain(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).json(str(updates_dir))
        stream = spark.readStream.schema(schema).json(str(updates_dir))
        q = apply_cdc_stream(
            stream, target, ("k",), ("day",), ckpt, order_col="seq"
        )
        q.awaitTermination(60)

    def state():
        return {
            r["k"]: (r["v"], r["seq"])
            for r in spark.read.parquet(target).collect()
        }

    drain([(1, "d1", 15.0, 5), (2, "d1", 20.0, 5)])  # batch 1: seq 5
    assert state() == {1: (15.0, 5), 2: (20.0, 5)}

    # batch 2 arrives LATER but carries seq 3 (older) for k=1, plus a
    # genuinely newer k=2 — only the newer one lands
    drain([(1, "d1", 99.0, 3), (2, "d1", 22.0, 7)])
    assert state() == {1: (15.0, 5), 2: (22.0, 7)}


def test_stream_stream_attribution_multi_batch_equals_batch(spark, sf_dir, tmp_path):
    """streaming_attribution's strict gate drains one file = one
    micro-batch; this test proves the SAME append-mode interval join
    stays equal to the batch twin when the drain spans MULTIPLE
    micro-batches — i.e. the watermark keeps exactly the state the
    cross-batch matches need and evicts only what no future purchase
    can touch. Events are split into 3 ts-ordered files and replayed
    with maxFilesPerTrigger=1, so clicks from batch k must still be in
    state when their purchases arrive in batch k+1."""
    from bigdatalab_spark.sources.readers import load_table, normalize_ts_layout
    from bigdatalab_spark.streaming.jobs import (
        stream_stream_interval_join,
        unique_sink_name,
    )

    events = load_table(spark, str(sf_dir), "events")
    n = events.count()
    # compute the batch twin FIRST: its pairs pick the split boundary so
    # at least one click/purchase pair is GUARANTEED to straddle a file
    # (= micro-batch) boundary — otherwise the test proves nothing
    # beyond the single-batch gate
    pairs_pdf = (
        events.alias("c")
        .filter("event_type = 'click'")
        .join(
            events.alias("p").filter("event_type = 'purchase'"),
            F.expr(
                "c.user_id = p.user_id AND p.ts > c.ts "
                "AND p.ts <= c.ts + INTERVAL 1 HOUR"
            ),
        )
        .select(
            F.col("c.event_id").alias("click_id"),
            F.col("p.event_id").alias("purchase_id"),
            F.col("c.ts").alias("click_ts"),
            F.col("p.ts").alias("purchase_ts"),
        )
        .toPandas()
    )
    assert len(pairs_pdf), "no attribution pairs in fixture"
    # boundary 1: right after the median pair's click -> its purchase
    # (strictly later ts) lands in a later file
    anchor = pairs_pdf.sort_values("click_ts").iloc[len(pairs_pdf) // 2]
    import time

    all_pdf = events.toPandas().sort_values("ts", kind="stable").reset_index(drop=True)
    b1 = anchor["click_ts"]
    later = all_pdf[all_pdf["ts"] > b1].reset_index(drop=True)
    b2 = later["ts"].iloc[len(later) // 2]
    thirds = [
        all_pdf[all_pdf["ts"] <= b1],
        all_pdf[(all_pdf["ts"] > b1) & (all_pdf["ts"] <= b2)],
        all_pdf[all_pdf["ts"] > b2],
    ]
    assert all(len(t) for t in thirds)
    src = tmp_path / "events_split"
    src.mkdir()
    total = 0
    for i, pdf in enumerate(thirds):
        total += len(pdf)
        pdf.to_parquet(str(src / f"part{i}.parquet"))
        time.sleep(1.1)  # distinct mtimes pin the replay order
    assert total == n

    schema = spark.read.parquet(str(src / "part0.parquet")).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    ev = normalize_ts_layout(raw)
    clicks = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    purchases = ev.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts"
    )
    joined = stream_stream_interval_join(clicks, purchases)
    name = unique_sink_name("attr_multibatch")
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 3, f"expected >=3 micro-batches, got {n_batches}"

    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.table(name).collect()
    }
    want = set(zip(pairs_pdf["click_id"], pairs_pdf["purchase_id"]))
    assert got == want
    # and the split genuinely produced cross-batch matches: some purchase
    # in file k+1 pairs a click in file <= k
    bounds = [pdf[["event_id"]].assign(f=i) for i, pdf in enumerate(thirds)]
    import pandas as pd

    fmap = dict(
        pd.concat(bounds).set_index("event_id")["f"]
    )
    cross = [(c, p) for c, p in want if fmap[c] != fmap[p]]
    assert cross, "ts split produced no cross-batch pairs; widen the interval"


@pytest.mark.slow
def test_stream_stream_attribution_survives_cross_process_restart(
    spark, sf_dir, tmp_path
):
    """Round-7: the multi-batch test replays 3 files in ONE process;
    this one proves the stream-stream join's state store survives REAL
    recovery (the reference's restart lesson, ExerciseNetcat.scala:67-81
    style): process A drains part of the replay and is hard-killed
    (os._exit — no stop(), no flush); process B is a FRESH SparkSession
    restarting from the same checkpoint and must finish the drain with
    the joined output exactly equal to the batch twin — clicks whose
    state was built before the crash still match purchases that arrive
    only after the restart, and the file sink's transaction log keeps
    delivery exactly-once across the crash."""
    import subprocess
    import sys
    import time

    from bigdatalab_spark.sources.readers import load_table

    events = load_table(spark, str(sf_dir), "events")
    pairs_pdf = (
        events.alias("c")
        .filter("event_type = 'click'")
        .join(
            events.alias("p").filter("event_type = 'purchase'"),
            F.expr(
                "c.user_id = p.user_id AND p.ts > c.ts "
                "AND p.ts <= c.ts + INTERVAL 1 HOUR"
            ),
        )
        .select(
            F.col("c.event_id").alias("click_id"),
            F.col("p.event_id").alias("purchase_id"),
            F.col("c.ts").alias("click_ts"),
            F.col("p.ts").alias("purchase_ts"),
        )
        .toPandas()
    )
    assert len(pairs_pdf) >= 4, "fixture too small for a 3-way split"
    # both file boundaries anchored ON pairs, so wherever the crash
    # lands (after file0 or file1) some pair straddles the A/B frontier
    by_click = pairs_pdf.sort_values("click_ts").reset_index(drop=True)
    b1 = by_click["click_ts"].iloc[len(by_click) // 3]
    later = by_click[by_click["click_ts"] > b1].reset_index(drop=True)
    assert len(later), "no pairs beyond the first boundary"
    b2 = later["click_ts"].iloc[len(later) // 2]

    all_pdf = events.toPandas().sort_values("ts", kind="stable").reset_index(drop=True)
    thirds = [
        all_pdf[all_pdf["ts"] <= b1],
        all_pdf[(all_pdf["ts"] > b1) & (all_pdf["ts"] <= b2)],
        all_pdf[all_pdf["ts"] > b2],
    ]
    assert all(len(t) for t in thirds)

    src = tmp_path / "events_split"
    out = tmp_path / "attr_out"
    ckpt = tmp_path / "attr_ckpt"
    src.mkdir()
    runner = tmp_path / "attr_runner.py"
    runner.write_text(
        """
import os, sys, time
phase, src, out, ckpt = sys.argv[1:5]
from bigdatalab_spark.session import get_session
from bigdatalab_spark.sources.readers import normalize_ts_layout
from bigdatalab_spark.streaming.jobs import stream_stream_interval_join
spark = get_session(app_name="attr-restart-" + phase)
spark.sparkContext.setLogLevel("ERROR")
schema = spark.read.parquet(os.path.join(src, "part0.parquet")).schema
raw = (spark.readStream.schema(schema)
       .option("maxFilesPerTrigger", 1).parquet(src))
ev = normalize_ts_layout(raw)
clicks = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts")
purchases = ev.filter("event_type = 'purchase'").select("event_id", "user_id", "ts")
writer = (stream_stream_interval_join(clicks, purchases)
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt).outputMode("append"))
if phase == "A":
    q = writer.trigger(processingTime="500 milliseconds").start()
    deadline = time.time() + 120
    while time.time() < deadline:
        done = [b for b in (q.recentProgress or []) if b["numInputRows"] > 0]
        if done:
            os._exit(7)  # hard crash mid-replay: no stop(), no cleanup
        time.sleep(0.2)
    os._exit(3)  # timed out before committing any batch
q = writer.trigger(availableNow=True).start()
q.awaitTermination()
n_live = len([b for b in (q.recentProgress or []) if b["numInputRows"] > 0])
spark.stop()
sys.exit(0 if n_live >= 1 else 4)
"""
    )
    # phase A sees only the first two files
    for i, pdf in enumerate(thirds[:2]):
        pdf.to_parquet(str(src / f"part{i}.parquet"))
        time.sleep(1.1)  # distinct mtimes pin the replay order

    env = dict(__import__("os").environ, PYTHONPATH="/root/repo")
    args = [sys.executable, str(runner), "A", str(src), str(out), str(ckpt)]
    proc_a = subprocess.run(
        args, cwd="/root/repo", env=env, capture_output=True, text=True, timeout=300
    )
    assert proc_a.returncode == 7, (
        f"phase A did not crash as scripted: rc={proc_a.returncode}\n"
        f"{proc_a.stderr[-2000:]}"
    )

    # the crash happened; only now does the third file arrive
    time.sleep(1.1)
    thirds[2].to_parquet(str(src / "part2.parquet"))

    args[2] = "B"
    proc_b = subprocess.run(
        args, cwd="/root/repo", env=env, capture_output=True, text=True, timeout=300
    )
    assert proc_b.returncode == 0, (
        f"phase B restart failed: rc={proc_b.returncode}\n{proc_b.stderr[-2000:]}"
    )

    got_pdf = spark.read.parquet(str(out)).toPandas()
    got = set(zip(got_pdf["click_id"], got_pdf["purchase_id"]))
    want = set(zip(pairs_pdf["click_id"], pairs_pdf["purchase_id"]))
    assert got == want
    # exactly-once across the crash: no duplicate joined rows either
    assert len(got_pdf) == len(want)
    # and the restart really crossed a state frontier: some pair's click
    # arrived in a file A could see while its purchase was in a file B
    # processed (b2-anchored pair straddles files 1|2 by construction)
    fmap = {}
    for i, pdf in enumerate(thirds):
        for eid in pdf["event_id"]:
            fmap[eid] = i
    assert any(fmap[c] != fmap[p] for c, p in want)


def test_observe_metrics_batch_and_streaming(spark, sf_dir, tmp_path):
    """df.observe() — in-flight pipeline telemetry: accumulator-style
    aggregates collected DURING an action on the same scan, no second
    job (the operational staple for row-count/quality gauges on a
    100 TB pipeline, where a separate metrics query would re-read the
    input). Batch: Observation object. Streaming: per-micro-batch
    observedMetrics in the query progress, summed across the drain."""
    import time

    from pyspark.sql import Observation

    from bigdatalab_spark.sources.readers import load_table
    from bigdatalab_spark.streaming.jobs import unique_sink_name

    ev = load_table(spark, str(sf_dir), "events")
    want_n = ev.count()
    want_total = ev.agg(F.sum("value")).collect()[0][0]

    obs = Observation("ev_metrics")
    observed = ev.observe(
        obs, F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
    )
    observed.select("event_type").distinct().count()  # any action on the scan
    got = obs.get
    assert got["n"] == want_n
    assert abs(got["total"] - want_total) < 1e-6

    # streaming: metrics must aggregate per micro-batch and be readable
    # from the progress events (the monitoring-hook surface)
    src = tmp_path / "obs_src"
    src.mkdir()
    pdf = ev.toPandas().sort_values("ts", kind="stable").reset_index(drop=True)
    half = len(pdf) // 2
    for i, chunk in enumerate((pdf.iloc[:half], pdf.iloc[half:])):
        chunk.to_parquet(str(src / f"part{i}.parquet"))
        time.sleep(1.1)
    schema = spark.read.parquet(str(src / "part0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .observe("batch_metrics", F.count(F.lit(1)).alias("n_rows"))
        .groupBy("event_type")
        .count()
    )
    name = unique_sink_name("obs_stream")
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    per_batch = [
        p["observedMetrics"]["batch_metrics"]["n_rows"]
        for p in q.recentProgress
        if p.get("observedMetrics")
    ]
    assert len(per_batch) >= 2  # metrics observed on every non-empty batch
    assert sum(per_batch) == want_n


@pytest.mark.slow
def test_dedup_ingest_stream_classifies_and_grows_the_index(spark, sf_dir, tmp_path):
    """The round-8 production loop: micro-batches classified against the
    durable dedup index, new docs appended, so a batch-2 copy of a
    batch-1-admitted doc is flagged exact_dup. Restarting the drained
    stream (same checkpoint) replays nothing and changes nothing —
    the exactly-once contract of the status log + idempotent append."""
    import time

    from bigdatalab_spark.scale.dedup import (
        incremental_dedup_from_index,
        load_dedup_index,
        save_dedup_index,
    )
    from bigdatalab_spark.sources import load_table
    from bigdatalab_spark.streaming.jobs import dedup_ingest_stream

    docs = load_table(spark, str(sf_dir), "documents").select("doc_id", "text")
    corpus = docs.filter("doc_id % 2 = 0")
    idx = str(tmp_path / "idx")
    save_dedup_index(corpus, idx)

    corpus_seed = corpus.sort("doc_id").limit(1).collect()[0]["text"]
    src = tmp_path / "ingest_src"
    src.mkdir()

    def w(name, rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(src / name))

    b1_new = "a genuinely new streaming document body one"
    w(
        "f1",
        [
            (10_000_001, corpus_seed),      # dup of the prebuilt corpus
            (10_000_002, b1_new),           # new -> appended
        ],
    )
    time.sleep(1.1)  # file source orders micro-batches by mtime
    w(
        "f2",
        [
            (10_000_003, b1_new),           # copy of batch-1-ADMITTED doc
            (10_000_004, b1_new + " but perturbed"),  # near-dup of it
            (10_000_005, "another wholly new streaming document"),
        ],
    )

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", "1"
    ).option("latestFirst", "false").parquet(str(src / "*"))
    status_path = str(tmp_path / "statuses")
    ckpt = str(tmp_path / "ckpt")
    q = dedup_ingest_stream(stream, idx, status_path, ckpt)
    q.awaitTermination(120)

    got = {
        r["doc_id"]: r["status"]
        for r in spark.read.parquet(status_path).collect()
    }
    assert got == {
        10_000_001: "exact_dup",
        10_000_002: "new",
        10_000_003: "exact_dup",   # only possible if batch 1 grew the index
        10_000_004: "near_dup",    # likewise
        10_000_005: "new",
    }, got

    # the admitted docs are served by the index now
    probe = spark.createDataFrame(
        [(20_000_001, b1_new)], "doc_id long, text string"
    )
    assert [
        r["status"]
        for r in incremental_dedup_from_index(spark, probe, idx).collect()
    ] == ["exact_dup"]

    # restart on the same checkpoint: nothing replays, nothing changes
    before = spark.read.parquet(f"{idx}/sizes").count()
    q2 = dedup_ingest_stream(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*")),
        idx,
        status_path,
        ckpt,
    )
    q2.awaitTermination(60)
    assert spark.read.parquet(f"{idx}/sizes").count() == before
    assert spark.read.parquet(status_path).count() == 5
    hashes, _, _, sizes, _ = load_dedup_index(spark, idx)
    assert hashes.count() == hashes.distinct().count()
    assert sizes.count() == sizes.select("doc_id").distinct().count()


def test_embedding_ingest_stream_grows_ivf_index_exactly_once(
    spark, sf_dir, tmp_path
):
    """The ANN twin of the dedup ingest loop: micro-batches of vectors
    folded into the durable IVF index under the frozen quantizer; an
    appended vector is servable immediately; restarts and id replays
    append nothing twice (anti-join replay guard on the corpus ids)."""
    import time

    from bigdatalab_spark.scale.similarity import (
        fit_ivf_index,
        ivf_serve_topk,
        load_ivf_index,
        save_ivf_index,
    )
    from bigdatalab_spark.sources import load_table
    from bigdatalab_spark.streaming.jobs import embedding_ingest_stream

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 4 != 0)
    assigned, centroids = fit_ivf_index(corpus, n_centroids=8, seed=42)
    idx = str(tmp_path / "ivf")
    save_ivf_index(assigned, centroids, idx)
    n0 = corpus.count()

    held = emb.filter(F.col("vec_id") % 4 == 0).sort("vec_id").limit(6).collect()
    schema = emb.select("vec_id", "embedding").schema
    src = tmp_path / "vec_src"
    src.mkdir()

    def w(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / name)
        )

    w("f1", [(10_000_000 + i, r["embedding"]) for i, r in enumerate(held[:3])])
    time.sleep(1.1)  # file source orders micro-batches by mtime
    # f2 replays one already-ingested id (guard must skip it) + 3 new
    w(
        "f2",
        [(10_000_000, held[0]["embedding"])]
        + [(20_000_000 + i, r["embedding"]) for i, r in enumerate(held[3:])],
    )

    def start():
        return embedding_ingest_stream(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .parquet(str(src / "*")),
            idx,
            str(tmp_path / "ckpt"),
        )

    start().awaitTermination(120)
    d_assigned, d_centroids = load_ivf_index(spark, idx)
    assert d_assigned.count() == n0 + 6  # 3 + (3 new; the replayed id skipped)
    assert (
        d_assigned.groupBy("neighbor_id").count().filter("count > 1").count()
        == 0
    )

    # an ingested copy of a held-out vector is served at rank 1
    probe = spark.createDataFrame([(1, held[0]["embedding"])], schema)
    top = ivf_serve_topk(probe, d_assigned, d_centroids, k=2, n_probe=2).collect()
    by_id = {r["neighbor_id"]: r["cos_sim"] for r in top}
    assert 10_000_000 in by_id and by_id[10_000_000] > 0.999999

    # restart on the same checkpoint: nothing replays, nothing changes
    start().awaitTermination(60)
    assert load_ivf_index(spark, idx)[0].count() == n0 + 6


@pytest.mark.slow
def test_ingest_stream_inline_compaction_bounds_file_count(
    spark, sf_dir, tmp_path
):
    """compact_every=N makes the ingest loop self-maintaining: after
    every Nth batch the index is compacted inline, so the file count is
    bounded by the compacted layout instead of growing one file set per
    append — and since the last drained batch triggers compaction, the
    final layout IS the compacted one (a second manual compaction is a
    no-op on file count). Rows unaffected."""
    import glob
    import time

    from bigdatalab_spark.scale.similarity import (
        compact_ivf_index,
        fit_ivf_index,
        load_ivf_index,
        save_ivf_index,
    )
    from bigdatalab_spark.sources import load_table
    from bigdatalab_spark.streaming.jobs import embedding_ingest_stream

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 4 != 0)
    assigned, centroids = fit_ivf_index(corpus, n_centroids=4, seed=42)
    idx = str(tmp_path / "ivf")
    save_ivf_index(assigned, centroids, idx)
    n0 = corpus.count()

    held = emb.filter(F.col("vec_id") % 4 == 0).sort("vec_id").limit(4).collect()
    schema = emb.select("vec_id", "embedding").schema
    src = tmp_path / "vec_src"
    src.mkdir()
    now = time.time()
    for i, r in enumerate(held):
        spark.createDataFrame(
            [(10_000_000 + i, r["embedding"])], schema
        ).coalesce(1).write.parquet(str(src / f"f{i}"))
    for i in range(len(held)):  # pin micro-batch order by mtime
        for fn in glob.glob(str(src / f"f{i}" / "*")):
            import os

            os.utime(fn, (now + i, now + i))

    q = embedding_ingest_stream(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src / "*")),
        idx,
        str(tmp_path / "ckpt"),
        compact_every=2,
    )
    q.awaitTermination(120)

    assert load_ivf_index(spark, idx)[0].count() == n0 + 4

    def n_files() -> int:
        return len(glob.glob(f"{idx}/corpus/**/*.parquet", recursive=True))

    after_stream = n_files()
    compact_ivf_index(spark, idx)  # already compacted: layout unchanged
    assert n_files() == after_stream


@pytest.mark.slow
def test_dedup_ingest_stream_interplay_with_tombstone_deletes(
    spark, sf_dir, tmp_path
):
    """Composition of the ingest loop with the round-8 delete contract:
    (a) a replayed stream must NOT resurrect a doc that was tombstoned
    after it was admitted (the replay guard's id check is load-bearing
    here, not just an idempotence nicety); (b) forgotten CONTENT under
    a FRESH id re-admits normally — it classifies as new and the next
    batch deduplicates against it again."""
    import time

    from bigdatalab_spark.scale.dedup import (
        incremental_dedup_from_index,
        remove_from_dedup_index,
        save_dedup_index,
    )
    from bigdatalab_spark.sources import load_table
    from bigdatalab_spark.streaming.jobs import dedup_ingest_stream

    docs = load_table(spark, str(sf_dir), "documents").select("doc_id", "text")
    corpus = docs.filter("doc_id % 2 = 0")
    idx = str(tmp_path / "idx")
    save_dedup_index(corpus, idx)

    body = "the document that will later be forgotten entirely"
    src = tmp_path / "src"
    src.mkdir()

    def w(name, rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(src / name))

    def run_stream():
        q = dedup_ingest_stream(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*")),
            idx,
            str(tmp_path / "statuses"),
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)

    w("f1", [(10_000_001, body)])
    run_stream()
    probe = spark.createDataFrame([(1, body)], "doc_id long, text string")

    def probe_status():
        return incremental_dedup_from_index(spark, probe, idx).collect()[0][
            "status"
        ]

    assert probe_status() == "exact_dup"  # admitted by the stream

    # forget the admitted doc; the content is gone from serving
    assert remove_from_dedup_index(
        spark.createDataFrame([(10_000_001,)], "doc_id long"), idx
    ) == 1
    assert probe_status() == "new"

    # (a) restart on the same checkpoint (full replay surface exists in
    # src): the deleted doc must NOT come back
    run_stream()
    assert probe_status() == "new"

    # (b) the same content under a FRESH id re-admits through the loop,
    # and a following batch deduplicates against it again
    time.sleep(1.1)
    w("f2", [(10_000_002, body)])
    time.sleep(1.1)
    w("f3", [(10_000_003, body)])
    run_stream()
    got = {
        r["doc_id"]: r["status"]
        for r in spark.read.parquet(str(tmp_path / "statuses")).collect()
    }
    assert got[10_000_002] == "new"        # forgotten content re-admits
    assert got[10_000_003] == "exact_dup"  # ...and is deduped against
    assert probe_status() == "exact_dup"


@pytest.mark.slow
def test_embedding_ingest_stream_interplay_with_tombstone_deletes(
    spark, sf_dir, tmp_path
):
    """ANN twin of the dedup interplay test: a vector tombstoned after
    streaming ingest must stay deleted across a full replay (the
    replay guard reads the RAW corpus store, so the dead id still
    blocks itself), while the same embedding under a fresh id
    re-admits and serves."""
    import time

    from bigdatalab_spark.scale.similarity import (
        fit_ivf_index,
        ivf_serve_topk,
        load_ivf_index,
        remove_from_ivf_index,
        save_ivf_index,
    )
    from bigdatalab_spark.streaming.jobs import embedding_ingest_stream

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    assigned, cents = fit_ivf_index(emb, n_centroids=4)
    save_ivf_index(assigned, cents, idx)

    vec = emb.limit(1).collect()[0]["embedding"]
    vec_schema = emb.select("vec_id", "embedding").schema  # float vectors
    src = tmp_path / "src"
    src.mkdir()

    def w(name, rows):
        spark.createDataFrame(rows, vec_schema).coalesce(1).write.parquet(
            str(src / name)
        )

    def run_stream():
        q = embedding_ingest_stream(
            spark.readStream.schema(vec_schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*")),
            idx,
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)

    q_frame = spark.createDataFrame([(1, vec)], vec_schema)

    def served_ids():
        corpus, cc = load_ivf_index(spark, idx)
        return {
            r["neighbor_id"]
            for r in ivf_serve_topk(q_frame, corpus, cc, k=3, n_probe=2).collect()
        }

    w("f1", [(30_000_001, vec)])
    run_stream()
    assert 30_000_001 in served_ids()  # ingested and servable

    assert remove_from_ivf_index(
        spark.createDataFrame([(30_000_001,)], "vec_id long"), idx
    ) == 1
    assert 30_000_001 not in served_ids()

    # full replay surface exists in src: the deleted vector stays gone
    run_stream()
    assert 30_000_001 not in served_ids()
    raw = spark.read.parquet(f"{idx}/corpus").filter(
        F.col("neighbor_id") == 30_000_001
    )
    assert raw.count() == 1  # exactly the original row — nothing re-appended

    # fresh id with the same embedding re-admits
    time.sleep(1.1)
    w("f2", [(30_000_002, vec)])
    run_stream()
    assert 30_000_002 in served_ids()
    assert 30_000_001 not in served_ids()


@pytest.mark.slow
def test_forget_stream_applies_streaming_deletes_exactly_once(
    spark, sf_dir, tmp_path
):
    """Deletion requests as a stream (the queue shape forgetting
    arrives in): two micro-batches of doc_ids tombstone docs out of
    the dedup index — content stops matching after the drain — and a
    full restart replays to zero new tombstones (the remover's
    staging anti-join IS the exactly-once mechanism). The ANN family
    switch is exercised on the IVF index with a served victim."""
    import time

    from bigdatalab_spark.scale.dedup import (
        incremental_dedup_from_index,
        save_dedup_index,
    )
    from bigdatalab_spark.scale.similarity import (
        fit_ivf_index,
        ivf_serve_topk,
        load_ivf_index,
        save_ivf_index,
    )
    from bigdatalab_spark.sources import load_table
    from bigdatalab_spark.streaming.jobs import forget_stream

    docs = load_table(spark, str(sf_dir), "documents").select("doc_id", "text")
    idx = str(tmp_path / "dedup")
    save_dedup_index(docs, idx)
    victims = [r["doc_id"] for r in docs.sort("doc_id").limit(2).collect()]
    bodies = [r["text"] for r in docs.sort("doc_id").limit(2).collect()]

    src = tmp_path / "del_src"
    src.mkdir()
    spark.createDataFrame([(victims[0],)], "doc_id long").coalesce(1).write.parquet(
        str(src / "f1")
    )
    time.sleep(1.1)
    spark.createDataFrame([(victims[1],)], "doc_id long").coalesce(1).write.parquet(
        str(src / "f2")
    )

    def run():
        q = forget_stream(
            spark.readStream.schema("doc_id long")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*")),
            idx,
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)

    probe = spark.createDataFrame(
        list(enumerate(bodies)), "doc_id long, text string"
    )

    def probe_statuses():
        return {
            r["doc_id"]: r["status"]
            for r in incremental_dedup_from_index(spark, probe, idx).collect()
        }

    assert set(probe_statuses().values()) == {"exact_dup"}  # pre-delete
    run()
    # exact content forgotten (victims' near-dup FAMILY members remain
    # in the corpus, so near_dup is still a legitimate outcome)
    assert "exact_dup" not in set(probe_statuses().values())
    n_tomb = spark.read.parquet(f"{idx}/tombstones").count()
    assert n_tomb == 2

    # restart = full replay surface: zero new tombstones
    run()
    assert spark.read.parquet(f"{idx}/tombstones").count() == n_tomb

    # ANN family switch
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ivf = str(tmp_path / "ivf")
    a, c = fit_ivf_index(emb, n_centroids=4)
    save_ivf_index(a, c, ivf)
    v = emb.sort("vec_id").limit(1).collect()[0]
    vsrc = tmp_path / "vdel_src"
    vsrc.mkdir()
    spark.createDataFrame([(v["vec_id"],)], "vec_id long").coalesce(
        1
    ).write.parquet(str(vsrc / "f1"))
    q = forget_stream(
        spark.readStream.schema("vec_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(vsrc / "*")),
        ivf,
        str(tmp_path / "vckpt"),
        family="ivf",
    )
    q.awaitTermination(120)
    corpus, cents = load_ivf_index(spark, ivf)
    qf = spark.createDataFrame(
        [(1, v["embedding"])], emb.select("vec_id", "embedding").schema
    )
    served = {
        r["neighbor_id"]
        for r in ivf_serve_topk(qf, corpus, cents, k=3, n_probe=2).collect()
    }
    assert v["vec_id"] not in served


# ---------------------------------------------------------------------------
# Offline state-store inspection (Spark 4 statestore / state-metadata source)
# ---------------------------------------------------------------------------


def _run_counted_stream(spark, sf_dir, ckpt, files_per_trigger=None):
    from bigdatalab_spark.streaming.jobs import stream_events, unique_sink_name

    stream = stream_events(spark, sf_dir)
    counts = stream.groupBy("user_id").count()
    q = (
        counts.writeStream.format("memory")
        .queryName(unique_sink_name("state_reader_t"))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return q


def test_state_metadata_describes_the_aggregation(spark, sf_dir, tmp_path):
    """state-metadata source: operator discovery without touching state —
    one stateful operator, RocksDB-backed, committed batch range sane."""
    from bigdatalab_spark.streaming.state_reader import read_state_metadata

    ckpt = str(tmp_path / "ckpt_meta")
    _run_counted_stream(spark, sf_dir, ckpt)
    meta = read_state_metadata(spark, ckpt).collect()
    assert len(meta) == 1
    row = meta[0]
    assert row.operatorName == "stateStoreSave"
    assert row.operatorId == 0
    assert row.numPartitions == int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert row.maxBatchId >= row.minBatchId >= 0


def test_state_store_contents_equal_batch_truth(spark, sf_dir, tmp_path):
    """The checkpoint's state, read OFFLINE via the statestore source,
    is exactly the batch groupBy answer — no replay, no sink involved."""
    from bigdatalab_spark.streaming.state_reader import grouped_count_state

    ckpt = str(tmp_path / "ckpt_eq")
    _run_counted_stream(spark, sf_dir, ckpt)
    got = {
        (r.user_id, r.cnt)
        for r in grouped_count_state(spark, ckpt).collect()
    }
    want = {
        (r.user_id, r.cnt)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_state_time_travel_reads_an_earlier_batch(spark, sf_dir, tmp_path):
    """batchId option time-travels: with the events parquet split into
    2 micro-batches, state@batch0 is a strict prefix of state@latest
    (counts no larger, keys a subset)."""
    import os

    from bigdatalab_spark.sources import load_table
    from bigdatalab_spark.streaming.jobs import unique_sink_name
    from bigdatalab_spark.streaming.state_reader import (
        grouped_count_state,
        read_state_metadata,
    )

    src = str(tmp_path / "src")
    events = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    events.filter("event_id % 2 = 0").coalesce(1).write.parquet(f"{src}/a")
    events.filter("event_id % 2 = 1").coalesce(1).write.parquet(f"{src}/b")
    import time as _t

    now = _t.time()
    for d, off in (("a", -10), ("b", 10)):
        for fn in os.listdir(f"{src}/{d}"):
            os.utime(f"{src}/{d}/{fn}", (now + off, now + off))
    ckpt = str(tmp_path / "ckpt_tt")
    q = (
        spark.readStream.schema("user_id long, event_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
        .groupBy("user_id")
        .count()
        .writeStream.format("memory")
        .queryName(unique_sink_name("state_tt"))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    meta = read_state_metadata(spark, ckpt).collect()[0]
    assert meta.maxBatchId > meta.minBatchId, "expected >=2 micro-batches"
    first = {
        r.user_id: r.cnt
        for r in grouped_count_state(spark, ckpt, batch_id=meta.minBatchId).collect()
    }
    last = {
        r.user_id: r.cnt for r in grouped_count_state(spark, ckpt).collect()
    }
    assert set(first) <= set(last)
    assert all(first[k] <= last[k] for k in first)
    assert sum(last.values()) == events.count()
    assert sum(first.values()) < sum(last.values())


def test_state_change_feed_is_the_mutation_audit_trail(spark, sf_dir, tmp_path):
    """readChangeFeed: the per-batch change rows replay to exactly the
    final state (last update per key wins), and every micro-batch that
    touched a key contributed rows — state CDC without snapshot diffs."""
    import os
    import time as _t

    from bigdatalab_spark.streaming.jobs import unique_sink_name
    from bigdatalab_spark.streaming.state_reader import (
        grouped_count_state,
        read_state_changes,
    )

    src = str(tmp_path / "src_cdc")
    events = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    events.filter("event_id % 2 = 0").coalesce(1).write.parquet(f"{src}/a")
    events.filter("event_id % 2 = 1").coalesce(1).write.parquet(f"{src}/b")
    now = _t.time()
    for d, off in (("a", -10), ("b", 10)):
        for fn in os.listdir(f"{src}/{d}"):
            os.utime(f"{src}/{d}/{fn}", (now + off, now + off))
    # changelog checkpointing is a write-time property of the stream
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )
    ckpt = str(tmp_path / "ckpt_cdc")
    try:
        q = (
            spark.readStream.schema("user_id long, event_id long")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*")
            .groupBy("user_id")
            .count()
            .writeStream.format("memory")
            .queryName(unique_sink_name("state_cdc"))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
    finally:
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled"
        )
    changes = read_state_changes(spark, ckpt, start_batch_id=0).collect()
    assert changes and all(r.change_type == "update" for r in changes)
    batches = {r.batch_id for r in changes}
    assert len(batches) >= 2, "both micro-batches should appear in the feed"
    # replay: last write per key == final state snapshot
    replayed = {}
    for r in sorted(changes, key=lambda r: r.batch_id):
        replayed[r.key.user_id] = r.value[0]
    final = {r.user_id: r.cnt for r in grouped_count_state(spark, ckpt).collect()}
    assert replayed == final


def test_streaming_ingest_maintains_skipping_index(spark, tmp_path):
    """Composition of the round's ingest and index stories: a streaming
    writer lands parquet batches with foreachBatch and keeps the
    file-skipping index CURRENT in the same hook — each batch probes
    only its own new files (refresh_file_index), so index maintenance
    rides the ingest instead of periodic full rebuilds. The maintained
    index must equal a from-scratch rebuild, and pruned reads through
    it must stay exact."""
    from pyspark.sql import functions as F

    from bigdatalab_spark.sources import load_table
    from bigdatalab_spark.sources.skipping import (
        build_file_index,
        pruned_read,
        refresh_file_index,
    )
    from bigdatalab_spark.streaming.jobs import stream_events

    table_dir = str(tmp_path / "ingested")
    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    def _land_and_index(batch_df, batch_id):
        batch_df.write.mode("append").parquet(table_dir)
        sess = batch_df.sparkSession
        try:
            old = sess.read.parquet(index_dir)
            new = refresh_file_index(sess, table_dir, old, ["user_id"])
        except Exception:
            new = build_file_index(sess, table_dir, ["user_id"])
        # materialize BEFORE overwriting the directory being read
        new.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            index_dir
        )

    q = (
        stream_events(spark, "/root/testdata/sf0.001")
        .writeStream.foreachBatch(_land_and_index)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    maintained = spark.read.parquet(index_dir)
    rebuilt = build_file_index(spark, table_dir, ["user_id"])
    assert sorted(map(tuple, maintained.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )

    lo, hi = 10.0, 20.0
    got = sorted(
        map(
            tuple,
            pruned_read(spark, table_dir, maintained, "user_id", lo, hi)
            .select("event_id")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            spark.read.parquet(table_dir)
            .filter(F.col("user_id").between(lo, hi))
            .select("event_id")
            .collect(),
        )
    )
    assert got == want and got
