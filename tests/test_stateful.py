"""Stateful streaming operator test: state persists across
micro-batches via applyInPandasWithState."""

from __future__ import annotations

import json
import os


def write_file(src: str, name: str, rows: list[dict]) -> None:
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_sessionize_stateful_closes_on_event_time_timeout(spark, tmp_path):
    """A session is emitted only after the watermark passes
    last_event + gap; until then it stays open in the state store."""
    from rs_streamloader_spark.streaming.stateful import sessionize_stateful

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id BIGINT, ts TIMESTAMP"
    closed: list = []

    def run():
        stream = spark.readStream.schema(schema).json(src)
        out = sessionize_stateful(stream)
        q = (
            out.writeStream.foreachBatch(lambda bdf, bid: closed.extend(bdf.collect()))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_file(src, "a.json", [
        {"user_id": 1, "ts": "2024-01-01T00:00:00"},
        {"user_id": 1, "ts": "2024-01-01T00:10:00"},
    ])
    run()
    assert closed == []  # session still open — watermark hasn't passed the gap

    # an event far in the future advances the watermark past 00:10+30m
    write_file(src, "b.json", [{"user_id": 2, "ts": "2024-01-01T06:00:00"}])
    run()
    sessions = [
        (r["user_id"], r["n_events"], r["session_start"].minute, r["session_end"].minute)
        for r in closed
    ]
    assert (1, 2, 0, 10) in sessions


def test_sessionize_stateful_splits_in_batch_gaps(spark, tmp_path):
    """Events of one key more than SESSION_GAP_S apart inside a single
    micro-batch (the availableNow-replay / backfill shape) must come
    out as SEPARATE sessions, not one min/max-merged row spanning the
    gap (ADVICE r1, high)."""
    from rs_streamloader_spark.streaming.stateful import sessionize_stateful

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id BIGINT, ts TIMESTAMP"
    closed: list = []

    def run():
        stream = spark.readStream.schema(schema).json(src)
        out = sessionize_stateful(stream)
        q = (
            out.writeStream.foreachBatch(lambda bdf, bid: closed.extend(bdf.collect()))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # one batch, three sessions' worth of events for user 1:
    # [00:00, 00:05], [02:00], and an open tail [05:00]
    write_file(src, "a.json", [
        {"user_id": 1, "ts": "2024-01-01T00:00:00"},
        {"user_id": 1, "ts": "2024-01-01T00:05:00"},
        {"user_id": 1, "ts": "2024-01-01T02:00:00"},
        {"user_id": 1, "ts": "2024-01-01T05:00:00"},
    ])
    run()
    done = [
        (r["user_id"], r["n_events"], r["session_start"].hour, r["session_end"].hour)
        for r in closed
    ]
    # the two gap-closed sessions are emitted immediately, in-batch
    assert (1, 2, 0, 0) in done and (1, 1, 2, 2) in done
    # the trailing session stays open in state (not emitted yet)
    assert len(done) == 2


def test_running_user_stats_accumulates_across_batches(spark, tmp_path):
    from rs_streamloader_spark.streaming.stateful import running_user_stats

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    write_file(src, "a.json", [
        {"user_id": 1, "value": 10.0},
        {"user_id": 1, "value": 5.0},
        {"user_id": 2, "value": 1.0},
    ])

    stream = spark.readStream.schema("user_id BIGINT, value DOUBLE").json(src)
    out = running_user_stats(stream)

    def run(name):
        captured = {}

        def capture(batch_df, batch_id):
            for r in batch_df.collect():
                captured[r["user_id"]] = (r["n_events"], r["total_value"])

        q = (
            out.writeStream.foreachBatch(capture)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return captured

    first = run("stateful_b1")
    assert first[1] == (2, 15.0) and first[2] == (1, 1.0)

    # second batch: state carries over, user 1 accumulates
    write_file(src, "b.json", [{"user_id": 1, "value": 2.5}])
    second = run("stateful_b2")
    assert second[1] == (3, 17.5)


def test_sessionize_stateful_runs_on_rocksdb_state_store(spark, tmp_path):
    """The 100 TB state path: the same applyInPandasWithState operator
    must run unchanged on the RocksDB state store provider (bounded
    executor memory, state spills to disk) — the provider is config,
    not code."""
    from rs_streamloader_spark.streaming.stateful import sessionize_stateful

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    write_file(src, "a.json", [
        {"user_id": 1, "ts": "2024-01-01T00:00:00"},
        {"user_id": 1, "ts": "2024-01-01T00:05:00"},
        {"user_id": 1, "ts": "2024-01-01T02:00:00"},
    ])
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    closed: list = []
    try:
        stream = spark.readStream.schema("user_id BIGINT, ts TIMESTAMP").json(src)
        q = (
            sessionize_stateful(stream)
            .writeStream.foreachBatch(
                lambda bdf, bid: closed.extend(bdf.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    # the in-batch gap closed the first session immediately
    assert [(r["user_id"], r["n_events"]) for r in closed] == [(1, 2)]


def test_sessionize_stateful_non_utc_session_timezone(spark, tmp_path):
    """Timeout epochs must be anchored in the session timezone the
    naive pandas timestamps are expressed in (code-review r2): under a
    UTC-8 session the old UTC anchoring computed timeouts 8h early,
    closing sessions on the next batch instead of at last+gap."""
    from rs_streamloader_spark.streaming.stateful import sessionize_stateful

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    closed: list = []

    def run():
        stream = spark.readStream.schema("user_id BIGINT, ts TIMESTAMP").json(src)
        q = (
            sessionize_stateful(stream)
            .writeStream.foreachBatch(lambda bdf, bid: closed.extend(bdf.collect()))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        write_file(src, "a.json", [
            {"user_id": 1, "ts": "2024-01-01T00:00:00"},
            {"user_id": 1, "ts": "2024-01-01T00:10:00"},
        ])
        run()
        # a batch 5 min later (watermark moves to 00:15, < 00:10+30m):
        # the open session must NOT close prematurely
        write_file(src, "b.json", [{"user_id": 2, "ts": "2024-01-01T00:15:00"}])
        run()
        assert closed == [], closed
        # watermark passes last+gap → now it closes
        write_file(src, "c.json", [{"user_id": 2, "ts": "2024-01-01T06:00:00"}])
        run()
        assert [(r["user_id"], r["n_events"]) for r in closed if r["user_id"] == 1] == [
            (1, 2)
        ]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_sessionize_stateful_late_event_bridges_held_sessions(spark, tmp_path):
    """With a watermark delay, a late event may legally arrive between
    two gap-separated segments; because gap-closed segments are HELD in
    state until the watermark passes (not emitted immediately), the
    late event merges them into the one true session instead of
    leaving an unretractable split in the append output."""
    from rs_streamloader_spark.streaming.stateful import sessionize_stateful

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    closed: list = []

    def run():
        stream = spark.readStream.schema("user_id BIGINT, ts TIMESTAMP").json(src)
        q = (
            sessionize_stateful(stream, watermark="1 hour")
            .writeStream.foreachBatch(lambda bdf, bid: closed.extend(bdf.collect()))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # 12:00 and 12:40 are > gap apart — two segments, both held
    write_file(src, "a.json", [
        {"user_id": 1, "ts": "2024-01-01T12:00:00"},
        {"user_id": 1, "ts": "2024-01-01T12:40:00"},
    ])
    run()
    assert closed == []
    # late 12:15 (legal under the 1h delay) bridges the two segments
    write_file(src, "b.json", [{"user_id": 1, "ts": "2024-01-01T12:15:00"}])
    run()
    # advance the watermark far past 12:40+gap → the ONE merged session emits
    write_file(src, "c.json", [{"user_id": 2, "ts": "2024-01-02T12:00:00"}])
    run()
    ones = [
        (r["n_events"], r["session_start"].hour, r["session_end"].minute)
        for r in closed
        if r["user_id"] == 1
    ]
    assert ones == [(3, 12, 40)], closed
