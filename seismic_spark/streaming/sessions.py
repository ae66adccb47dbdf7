"""Gap-based sessionization — batch (JVM window) and stateful streaming
(`applyInPandasWithState`) over the events table.

The reference has no streaming (SURVEY.md §2.7); this is part of the
training-data-pipeline surface: group a user's event stream into sessions
separated by idle gaps > ``gap_minutes``.  Two implementations with the
same output contract:

- :func:`sessionize` — batch: lag/cumsum window per user, pure JVM
  expressions, SQL-expressible (the DuckDB oracle's form).  One shuffle on
  user_id; per-user state is a sort within the partition, so skew is
  bounded by the busiest user's event count (a real pipeline buckets
  mega-users by day first).
- :func:`sessionize_stream` — Structured Streaming: per-user GroupState
  holds the open session; a new event either extends it or closes it and
  emits the finished row.  State size is O(1) per user (five scalars) —
  watermark/timeout-based eviction is where a production job bounds the
  key space; the test contract (closed sessions == batch twin minus each
  user's final open session) is deterministic without it.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id BIGINT, session_seq INT, session_start STRING, "
    "session_end STRING, n_events BIGINT, sum_value DOUBLE"
)
_STATE_SCHEMA = (
    "session_seq INT, start_ts DOUBLE, last_ts DOUBLE, n_events BIGINT, "
    "sum_value DOUBLE"
)
_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: a session breaks when the gap from the previous
    event of the same user exceeds ``gap_minutes``.

    Output: one row per (user_id, session_seq) with start/end (formatted —
    portable hashing), event count and 4dp value sum.  Ties on ts are
    ordered by event_id so the plan is deterministic.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # integer microseconds (unix_micros / epoch_us in the oracle): the gap
    # comparison must be exact on both engines, not float-rounded; the
    # timestamp cast maps TIMESTAMP_NTZ parquet columns via the session tz
    # (UTC), same as DuckDB's epoch_us on naive timestamps
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(us).over(w)
    brk = (
        F.when(
            prev.isNull() | (us - prev > gap_minutes * 60_000_000),
            1,
        )
        .otherwise(0)
        .cast("int")
    )
    tagged = events.withColumn("_brk", brk).withColumn(
        "session_seq", F.sum("_brk").over(w).cast("int")
    )
    return (
        tagged.groupBy("user_id", "session_seq")
        .agg(
            F.date_format(F.min("ts"), _TS_FMT).alias("session_start"),
            F.date_format(F.max("ts"), _TS_FMT).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Stateful-streaming sessionization (`applyInPandasWithState`).

    Emits a session row the moment a same-user event arrives more than
    ``gap_minutes`` after the open session's last event; the final session
    of each user stays open in state (a production job adds a processing-
    time timeout to flush idle users).  Events are sorted (ts, event_id)
    within each micro-batch; in-order delivery across batches is assumed
    (late events would need the timeout/watermark variant).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.exists:
            seq, start_ts, last_ts, n_ev, sum_v = state.get
        else:
            seq, start_ts, last_ts, n_ev, sum_v = 0, None, None, 0, 0.0
        out: list[tuple] = []
        # one sort over the WHOLE group: the iterator yields Arrow-chunk-
        # sized pdfs with no cross-chunk ordering guarantee, so sorting
        # each chunk alone would process a large user out of time order
        chunks = [p for p in pdfs if not p.empty]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            # integer microseconds (exact in the DOUBLE state field up to
            # 2^53 µs ≈ year 2255) — same unit as the batch twin's
            # unix_micros, so gap decisions agree bit-for-bit
            for ts, val in zip(
                (pdf["ts"].astype("int64").to_numpy() // 1000).tolist(),
                pdf["value"].to_numpy(),
            ):
                if last_ts is not None and ts - last_ts > gap_us:
                    out.append((user_id, seq, start_ts, last_ts, n_ev, sum_v))
                    seq, start_ts, n_ev, sum_v = seq + 1, ts, 0, 0.0
                if start_ts is None:
                    seq, start_ts = 1, ts
                last_ts = ts
                n_ev += 1
                sum_v += float(val)
        state.update((seq, float(start_ts) if start_ts is not None else None,
                      float(last_ts) if last_ts is not None else None,
                      n_ev, sum_v))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out],
                    "session_seq": [r[1] for r in out],
                    "session_start": [
                        _fmt_epoch(r[2]) for r in out
                    ],
                    "session_end": [_fmt_epoch(r[3]) for r in out],
                    "n_events": [r[4] for r in out],
                    # half-away-from-zero like F.round in the batch twin
                    # (Python round() is banker's)
                    "sum_value": [_round4(r[5]) for r in out],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _round4(x: float) -> float:
    """F.round's HALF_UP at 4dp (half away from zero, sign-aware)."""
    import math

    return math.copysign(math.floor(abs(x) * 1e4 + 0.5) / 1e4, x)


def _fmt_epoch(ts_us: float) -> str:
    """Epoch microseconds → 'yyyy-MM-dd HH:mm:ss' (UTC), matching
    date_format under spark.sql.session.timeZone=UTC."""
    return pd.Timestamp(int(ts_us), unit="us", tz="UTC").strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def start_session_stream(
    spark, events_dir: str, out_dir: str, checkpoint: str, gap_minutes: int = 30
):
    """File-source wiring: drain available event files, append closed
    sessions to ``out_dir`` parquet."""
    schema = (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING"
    )
    stream = spark.readStream.schema(schema).parquet(events_dir)
    sessions = sessionize_stream(stream, gap_minutes)
    return (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
