"""Stateful-streaming sessionization: the applyInPandasWithState stream,
drained over TWO file-source chunks, emits exactly the batch twin's closed
sessions (everything except each user's final session, which stays open in
state).  Also pins the batch operator against a hand-computed case."""

import os

from pyspark.sql import functions as F

from seismic_spark.streaming.sessions import sessionize, start_session_stream

# (event_id, ts, user_id, value) — user 1: three sessions; user 2: two;
# user 3: one long session (never closed).  Gaps are in minutes around the
# 30-minute cut; all comparisons land on exact integer seconds.
EVENTS = [
    (1, "2024-01-01 10:00:00", 1, 1.0),
    (2, "2024-01-01 10:10:00", 1, 2.0),
    (3, "2024-01-01 11:00:00", 1, 4.0),   # gap 50 min → new session
    (4, "2024-01-01 11:29:00", 1, 8.0),
    (5, "2024-01-01 12:00:00", 1, 16.0),  # gap 31 min → new session
    (6, "2024-01-01 09:00:00", 2, 1.5),
    (7, "2024-01-01 09:30:00", 2, 2.5),   # gap exactly 30 min → SAME session
    (8, "2024-01-01 23:00:00", 2, 3.5),   # new session
    (9, "2024-01-01 08:00:00", 3, 1.0),
    (10, "2024-01-01 08:20:00", 3, 1.0),
]
SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def _events_df(spark, rows):
    return spark.createDataFrame(
        [(i, ts, u, "click", v, "{}") for i, ts, u, v in rows],
        "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_batch_sessionize_hand_case(spark):
    got = {
        (r.user_id, r.session_seq): (
            r.session_start, r.session_end, r.n_events, r.sum_value
        )
        for r in sessionize(_events_df(spark, EVENTS), gap_minutes=30).collect()
    }
    assert got == {
        (1, 1): ("2024-01-01 10:00:00", "2024-01-01 10:10:00", 2, 3.0),
        (1, 2): ("2024-01-01 11:00:00", "2024-01-01 11:29:00", 2, 12.0),
        (1, 3): ("2024-01-01 12:00:00", "2024-01-01 12:00:00", 1, 16.0),
        (2, 1): ("2024-01-01 09:00:00", "2024-01-01 09:30:00", 2, 4.0),
        (2, 2): ("2024-01-01 23:00:00", "2024-01-01 23:00:00", 1, 3.5),
        (3, 1): ("2024-01-01 08:00:00", "2024-01-01 08:20:00", 2, 2.0),
    }


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """Two availableNow drains over time-ordered chunks → emitted sessions
    == batch sessions minus each user's final (still-open) session."""
    events_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(events_dir, exist_ok=True)

    ordered = sorted(EVENTS, key=lambda r: r[1])
    chunks = [ordered[:5], ordered[5:]]
    for chunk in chunks:
        _events_df(spark, chunk).coalesce(1).write.mode("append").parquet(
            events_dir
        )
        q = start_session_stream(spark, events_dir, out_dir, ckpt, gap_minutes=30)
        q.awaitTermination(180)

    emitted = {
        (r.user_id, r.session_seq): (
            r.session_start, r.session_end, r.n_events, r.sum_value
        )
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = sessionize(_events_df(spark, EVENTS), gap_minutes=30)
    last = batch.groupBy("user_id").agg(F.max("session_seq").alias("mx"))
    closed = {
        (r.user_id, r.session_seq): (
            r.session_start, r.session_end, r.n_events, r.sum_value
        )
        for r in batch.join(last, "user_id")
        .filter(F.col("session_seq") < F.col("mx"))
        .collect()
    }
    assert emitted == closed
    assert len(emitted) == 3  # users 1 (two closed) and 2 (one closed)


def test_stream_sessionize_multichunk_out_of_order(spark, tmp_path):
    """A large user whose micro-batch spans many Arrow chunks, written in
    shuffled row order: the state fn must sort the WHOLE group (per-chunk
    sorting would interleave sessions and break the batch contract)."""
    import hashlib

    events_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(events_dir, exist_ok=True)

    # 30 sessions × 100 events: 1-min steps inside a session (99 min span),
    # 150-min block stride ⇒ 51-min gaps between sessions (> 30-min cut);
    # rows shuffled deterministically so chunk boundaries are out of order
    rows = []
    for i in range(3000):
        ts = 1704067200 + (i // 100) * 9000 + (i % 100) * 60
        rows.append((i, ts, 7, float(i % 5)))
    rows.sort(key=lambda r: hashlib.md5(str(r[0]).encode()).hexdigest())
    df = spark.createDataFrame(
        [(i, ts, 7, "e", v, "{}") for i, ts, _, v in rows],
        "event_id BIGINT, ts_epoch BIGINT, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).select(
        "event_id",
        F.timestamp_seconds("ts_epoch").alias("ts"),
        F.lit(7).cast("bigint").alias("user_id"),
        "event_type", "value", "props",
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        df.coalesce(1).write.mode("append").parquet(events_dir)
        q = start_session_stream(spark, events_dir, out_dir, ckpt, gap_minutes=30)
        q.awaitTermination(180)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    emitted = {
        (r.user_id, r.session_seq): (
            r.session_start, r.session_end, r.n_events, r.sum_value
        )
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = sessionize(df, gap_minutes=30)
    closed = {
        (r.user_id, r.session_seq): (
            r.session_start, r.session_end, r.n_events, r.sum_value
        )
        for r in batch.filter(F.col("session_seq") < 30).collect()
    }
    assert len(emitted) == 29
    assert emitted == closed
