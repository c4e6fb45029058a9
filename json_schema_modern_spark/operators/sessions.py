"""Gap-based event sessionization (batch analogue of Structured
Streaming's session windows).

Scale shape: ONE shuffle — hash-partition by the user key — then an
in-partition sort feeds both window functions and the final per-session
aggregate without any further exchange (Catalyst reuses the
(user, ts)-ordering for lag, the running sum, and the groupBy).  Memory
is bounded by the largest single user's event count, NOT the table size —
window keys cannot be split, so a pathological single-key hot spot is the
one residual risk; at that point pre-split sessions per (user, day) and
stitch boundaries, the standard two-phase fix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_s(c: Column) -> Column:
    """Truncated epoch seconds.  TIMESTAMP_NTZ cannot cast to long
    directly; via timestamp_ltz the naive value is interpreted in the
    session timezone (the engine pins UTC — session.py), matching how
    DuckDB's epoch() reads a naive timestamp."""
    return c.cast("timestamp_ltz").cast("long")


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign a per-user session index: a new session starts when the gap
    to the previous event exceeds `gap_minutes`.  Adds `session_idx`
    (1-based per user, in time order)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id") \
        if "event_id" in df.columns else Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    gap_s = int(gap_minutes * 60)
    new_sess = (
        prev.isNull()
        | ((_epoch_s(F.col(ts_col)) - _epoch_s(prev)) > gap_s)
    ).cast("int")
    # two projections: Spark cannot nest the lag window inside sum().over;
    # Catalyst still runs both over ONE exchange + sort (same window spec)
    return (
        df.withColumn("_new_sess", new_sess)
        .withColumn("session_idx", F.sum("_new_sess").over(w))
        .drop("_new_sess")
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-session rollup: (user, session_idx, n_events, start_epoch,
    end_epoch, duration_s).  Epoch seconds, not timestamps, so results
    are engine-portable bit-for-bit."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    return (
        s.groupBy(user_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(_epoch_s(F.col(ts_col))).alias("start_epoch"),
            F.max(_epoch_s(F.col(ts_col))).alias("end_epoch"),
        )
        .withColumn("duration_s", F.col("end_epoch") - F.col("start_epoch"))
        .orderBy(user_col, "session_idx")
    )
