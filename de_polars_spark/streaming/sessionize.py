"""Gap-based sessionization: native session windows + a custom stateful op.

Two implementations of the same semantics (events of one key whose
neighbors are <= ``gap`` apart form a session; session_end = last event
+ gap, Spark's ``session_window`` convention):

- :func:`session_agg` — Spark's built-in ``session_window`` (JVM-side,
  whole-stage codegen; merges windows at shuffle time). Works on batch
  and streaming frames unchanged — the preferred path.
- :func:`sessionize_stateful` — the same thing hand-built on
  ``applyInPandasWithState`` (event-time timeout). Exists as the template
  for stateful logic ``session_window`` can NOT express (per-session
  distinct counts, early emission, session caps): swap the pandas body,
  keep the state/timeout plumbing.

Scale notes: both shuffle once on the grouping key; state store size for
the stateful op is one row per OPEN session (closed sessions are emitted
and dropped at watermark timeout), so memory is bounded by active keys
inside the watermark horizon, not by history. The batch ``session_agg``
is used by the oracle-checked ``session_window_agg`` inventory entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def session_agg(
    df: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Per-(key, session) rollup via the native ``session_window`` operator."""
    if df.isStreaming and watermark:
        df = df.withWatermark(time_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(time_col), gap), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast(T.DecimalType(38, 6)))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def sessionize_stateful(
    stream: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    gap_minutes: int = 30,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Sessionization as a custom stateful operator.

    State per key = the one open session (start, last, n, total) as epoch
    micros; a batch closes every in-batch session whose gap is exceeded
    and emits it, then parks the trailing open session in the state store
    with an event-time timeout of ``last + gap`` — the watermark passing
    that point fires the timeout and emits the session without any new
    event arriving. Output matches :func:`session_agg` row for row once
    all sessions are closed.
    """
    import pandas as pd  # local: executor-side only

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_us", T.LongType()),
            T.StructField("last_us", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def _emit(key: int, start_us: int, last_us: int, n: int, total: float):
        return {
            key_col: key,
            "session_start": pd.Timestamp(start_us, unit="us"),
            "session_end": pd.Timestamp(last_us + gap_us, unit="us"),
            "n_events": n,
            "total_value": float(total),
        }

    def fn(key, pdf_iter, state: GroupState):
        (k,) = key
        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            state.remove()
            yield pd.DataFrame([_emit(k, start_us, last_us, n, total)])
            return
        events = pd.concat(list(pdf_iter), ignore_index=True)
        if events.empty:
            return
        events = events.sort_values(time_col)
        ts_us = events[time_col].astype("int64") // 1000  # ns -> us
        vals = events[value_col].astype("float64")
        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            first = int(ts_us.iloc[0])
            start_us, n, total = first, 0, 0.0
            last_us = first - gap_us - 1  # forces new-session on the first row
        closed = []
        for t_us, v in zip(ts_us, vals):
            t_us = int(t_us)
            if t_us - last_us > gap_us:
                if n > 0:
                    closed.append(_emit(k, start_us, last_us, n, total))
                start_us, n, total = t_us, 0, 0.0
            # late-but-within-watermark events fold into the open session
            # without moving its end backwards
            start_us = min(start_us, t_us) if n else start_us
            last_us = max(last_us, t_us) if n else t_us
            n, total = n + 1, total + float(v)
        state.update((start_us, last_us, n, total))
        state.setTimeoutTimestamp((last_us + gap_us) // 1000 + 1)  # ms, just past end
        if closed:
            yield pd.DataFrame(closed)

    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            fn,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
