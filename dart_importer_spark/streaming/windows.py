"""Structured-Streaming analytics over the transcript/event stream:
watermarked windowed aggregation (late-data handling) and a custom
stateful operator (sessionization via applyInPandasWithState).

Both follow the Spark streaming model the engine's refresh path uses
(file landing dir → availableNow trigger → checkpointed query):

- :func:`windowed_counts` — tumbling-window counts with a watermark.
  Append output mode means a window is emitted exactly once, when the
  watermark passes its end: late events inside the watermark still
  count; events later than the watermark are dropped — ES date_histogram
  semantics under continuous ingest.
- :func:`streaming_sessionize` — per-key session assignment with
  explicit state (last event time + running session counter), the
  applyInPandasWithState form of the batch ``operators.sessions``
  operator. State size is O(keys), not O(events).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def windowed_counts(
    stream: DataFrame,
    time_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    dims: tuple[str, ...] = (),
) -> DataFrame:
    """Tumbling-window counts over a stream with late-data tolerance
    ``watermark``. Compose with ``writeStream.outputMode('append')`` so
    each window is finalized exactly once. The aggregation state Spark
    keeps is bounded by (windows inside the watermark × dims) — the
    watermark is what makes unbounded-stream aggregation finite."""
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("w"),
                 *[F.col(d) for d in dims])
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
            .alias("bucket"),
            *dims,
            "n",
        )
    )


_SESSION_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("session_seq", LongType()),
])
_SESSION_STATE = StructType([
    StructField("last_ts", LongType()),     # epoch seconds of last event
    StructField("session_seq", LongType()),  # running session counter
])


def _sessionize_fn(gap_s: int, evict_ms: int | None):
    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return iter(())
        last_ts, seq = state.get if state.exists else (None, 0)
        outs = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for r in pdf.itertuples(index=False):
                t = int(r.ts.timestamp())
                if last_ts is None or t - last_ts > gap_s:
                    seq += 1
                last_ts = t
                outs.append((user_id, int(r.event_id), r.ts, int(seq)))
        state.update((last_ts, seq))
        if evict_ms is not None:
            state.setTimeoutDuration(evict_ms)
        if not outs:
            return iter(())
        return iter([pd.DataFrame(outs, columns=[f.name for f in _SESSION_OUT])])

    return fn


def streaming_sessionize(
    stream: DataFrame,
    gap_s: int = 1800,
    evict_ms: int | None = None,
) -> DataFrame:
    """Per-user session ids over a stream of (user_id, event_id, ts):
    a new session starts when the gap since the user's previous event
    exceeds ``gap_s``. State per user is TWO numbers (last event time,
    session counter) updated batch-by-batch — the applyInPandasWithState
    form of the batch sessionize operator. Within a micro-batch events
    are ordered (ts, event_id); cross-batch ordering is the stream's
    arrival contract, exactly like any event-time sessionizer downstream
    of a shuffle-by-key.

    ``evict_ms`` arms a processing-time timeout that drops idle users'
    state — set it on a CONTINUOUS deployment to bound state on an
    unbounded key space. Leave None (NoTimeout) under availableNow /
    batch-drain triggers: an armed-but-unfired timeout keeps the
    "cleaning up state" phase of an availableNow run alive until the
    timeout fires, which is exactly the hang this default avoids.

    Compose with ``writeStream.outputMode('update')``."""
    return (
        stream.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(int(gap_s), int(evict_ms) if evict_ms else None),
            outputStructType=_SESSION_OUT,
            stateStructType=_SESSION_STATE,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if evict_ms
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
