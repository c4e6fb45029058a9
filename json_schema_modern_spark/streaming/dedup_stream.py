"""Custom stateful streaming operator: exact first-seen deduplication.

The target contract's streaming story includes custom stateful operators
via ``applyInPandasWithState`` — this is the canonical one for a training
pipeline: emit only the FIRST document per normalization fingerprint
across the stream's lifetime, suppressing every later duplicate.

Shape: groupBy(fingerprint) → applyInPandasWithState.  State per key is
just the kept doc id (a few bytes); the grouping key partitions the state
store, so state lookups are local to the shuffle partition — the standard
Structured Streaming scale path.  Within a micro-batch the winner is the
MINIMUM doc id (deterministic regardless of Arrow batch arrival order).

Unbounded-state caveat (same position as validate_stream's docstring): at
10^12 distinct fingerprints an exact state store is the wrong tool — use
``dedup_stream_ttl`` below (ProcessingTimeTimeout + setTimeoutDuration,
state bounded to ~one TTL of keys) for sliding-window dedup, or the batch
hash-bucket pass (operators/dedup.py) for full-corpus dedup; ``dedup_stream``
is the exact-stream variant for bounded key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _fingerprint(text_col: str):
    """Normalization fingerprint — identical to text.fingerprint (lower,
    strip non-alnum, collapse whitespace, md5)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " ")
    norm = F.trim(F.regexp_replace(norm, r"\s+", " "))
    return F.md5(norm)


def dedup_stream(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(fp, keep_id, n_docs) — one row per NEW fingerprint, emitted the
    first micro-batch that fingerprint appears; later occurrences (same
    or subsequent batches) are suppressed and counted into state.

    n_docs = occurrences seen in the batch that first produced the key
    (the within-batch duplicate count the pipeline usually logs)."""
    import pandas as pd  # noqa: F401 (worker-side import)

    out_schema = StructType.fromDDL(f"fp string, keep_id long, n_docs long")
    state_schema = StructType.fromDDL("keep_id long, seen long")

    def first_seen(key, pdf_iter, state):
        import pandas as pd

        batch_n = 0
        batch_min = None
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            batch_n += len(pdf)
            m = int(pdf[id_col].min())
            batch_min = m if batch_min is None else min(batch_min, m)
        if state.exists:
            keep_id, seen = state.get
            state.update((int(keep_id), int(seen) + batch_n))
            return iter(())          # duplicate of an earlier batch: emit nothing
        state.update((int(batch_min), batch_n))
        yield pd.DataFrame({"fp": [key[0]], "keep_id": [batch_min],
                            "n_docs": [batch_n]})

    keyed = stream_df.select(
        _fingerprint(text_col).alias("fp"), F.col(id_col).cast("long").alias(id_col))
    return keyed.groupBy("fp").applyInPandasWithState(
        first_seen, out_schema, state_schema,
        outputMode="append", timeoutConf="NoTimeout")


def dedup_stream_ttl(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    ttl_ms: int = 3_600_000,
) -> DataFrame:
    """Sliding-window first-seen dedup — the TTL variant the exact
    operator's docstring prescribes for unbounded key cardinality.

    Semantics: a fingerprint re-emits when the gap since its last
    occurrence exceeds ``ttl_ms`` (measured on ``ts_col``, epoch millis —
    event-driven, so replays are deterministic); occurrences inside the
    window are suppressed and counted.  State memory is BOUNDED two ways:

    - logically, by the expiry check on ``ts_col`` (an expired entry is
      overwritten in place when its key recurs);
    - physically, by ``ProcessingTimeTimeout`` +
      ``state.setTimeoutDuration(ttl_ms)``: a key idle past the TTL gets
      its state REMOVED at the next micro-batch, so the store holds only
      keys seen within roughly one TTL — the property that makes this
      safe at 10^12 lifetime fingerprints where the exact variant is not.

    Output: (fp, keep_id, n_docs, window_start_ms) — ONE immutable row
    per (fingerprint, TTL window), emitted when the window OPENS (append
    mode; the keep/suppress decision must not wait a TTL):
    ``window_start_ms`` = min timestamp and ``n_docs`` = occurrence count
    *in the window-opening micro-batch*.  Later within-window occurrences
    are suppressed; their count and latest timestamp live in the state
    row (driving the gap rule) but are NOT re-emitted — an appended row
    is immutable, and the timeout eviction that bounds memory discards
    the tally with the state.  A consumer needing exact per-window totals
    runs the batch operator over the closed window instead."""
    import pandas as pd  # noqa: F401 (worker-side import)

    out_schema = StructType.fromDDL(
        "fp string, keep_id long, n_docs long, window_start_ms long")
    state_schema = StructType.fromDDL("keep_id long, seen long, last_ms long")

    def first_seen_ttl(key, pdf_iter, state):
        import pandas as pd

        if state.hasTimedOut:
            # idle past the TTL: evict — the physical memory bound
            state.remove()
            return iter(())
        batch_n, batch_min, batch_min_ts, batch_max_ts = 0, None, None, None
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            batch_n += len(pdf)
            m = int(pdf[id_col].min())
            batch_min = m if batch_min is None else min(batch_min, m)
            lt = int(pdf[ts_col].min())
            batch_min_ts = lt if batch_min_ts is None else min(batch_min_ts, lt)
            mt = int(pdf[ts_col].max())
            batch_max_ts = mt if batch_max_ts is None else max(batch_max_ts, mt)
        fresh = not state.exists
        if not fresh:
            keep_id, seen, last_ms = state.get
            if batch_max_ts - int(last_ms) > ttl_ms:
                fresh = True         # window expired: this batch opens a new one
            else:
                state.update((int(keep_id), int(seen) + batch_n,
                              max(int(last_ms), batch_max_ts)))
                state.setTimeoutDuration(ttl_ms)
                return iter(())
        state.update((int(batch_min), batch_n, batch_max_ts))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"fp": [key[0]], "keep_id": [batch_min],
                            "n_docs": [batch_n],
                            "window_start_ms": [batch_min_ts]})

    keyed = stream_df.select(
        _fingerprint(text_col).alias("fp"),
        F.col(id_col).cast("long").alias(id_col),
        F.col(ts_col).cast("long").alias(ts_col))
    return keyed.groupBy("fp").applyInPandasWithState(
        first_seen_ttl, out_schema, state_schema,
        outputMode="append", timeoutConf="ProcessingTimeTimeout")
