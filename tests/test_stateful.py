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
