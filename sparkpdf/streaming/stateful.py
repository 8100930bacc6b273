"""Custom stateful streaming operators (applyInPandasWithState).

The extraction pipeline itself is stateless (kernels are per-document
pure), but corpus INGESTION needs cross-batch state: "have I already
accepted a document with this content digest?" This module implements
streaming exact-dedup as a keyed state machine — state (seen count)
lives in the streaming checkpoint, so restarts resume exactly where
they stopped, and duplicates arriving in LATER micro-batches (which
plain dropDuplicates-within-a-batch misses) are suppressed too.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("digest", StringType()),
        StructField("doc_id", StringType()),
        StructField("dup_rank", IntegerType()),
    ]
)
DEDUP_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _dedup_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (digest,) = key
    seen = state.get[0] if state.exists else 0
    out = {"digest": [], "doc_id": [], "dup_rank": []}
    for pdf in pdfs:
        for doc_id in pdf["doc_id"]:
            out["digest"].append(digest)
            out["doc_id"].append(str(doc_id))
            out["dup_rank"].append(seen)  # 0 = first occurrence ever
            seen += 1
    state.update((seen,))
    yield pd.DataFrame(out)


def streaming_exact_dedup(doc_stream: DataFrame) -> DataFrame:
    """documents stream (doc_id, text) -> (digest, doc_id, dup_rank);
    keep dup_rank == 0 rows for the deduplicated corpus. State = count
    of docs seen per digest, carried across micro-batches AND restarts
    by the streaming checkpoint."""
    keyed = doc_stream.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.md5(F.col("text").cast("binary")).alias("digest"),
    )
    return keyed.groupBy("digest").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", IntegerType()),
        StructField("closed_by", StringType()),  # 'gap' | 'timeout'
    ]
)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start", LongType()),
        StructField("last", LongType()),
        StructField("n", LongType()),
    ]
)


def _session_fn_factory(gap_ms: int, timeout_ms: int):
    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        out = {k.name: [] for k in SESSION_OUT_SCHEMA.fields}

        def emit(start, last, n, why):
            out["user_id"].append(user_id)
            out["session_start"].append(int(start))
            out["session_end"].append(int(last))
            out["n_events"].append(int(n))
            out["closed_by"].append(why)

        if state.hasTimedOut:
            # idle user: flush the open session from state and drop it
            start, last, n = state.get
            emit(start, last, n, "timeout")
            state.remove()
            yield pd.DataFrame(out)
            return
        start, last, n = state.get if state.exists else (None, None, 0)
        ts_all = sorted(
            int(t) for pdf in pdfs for t in pdf["ts"]
        )
        for t in ts_all:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_ms:
                emit(start, last, n, "gap")
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        if start is not None:
            state.update((start, last, n))
            # the open session flushes when the user goes idle for
            # timeout_ms of PROCESSING time (no event-time watermark
            # needed for the flush; the gap rule handles event time)
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(out)

    return fn


def streaming_sessionize(
    event_stream: DataFrame,
    gap_ms: int = 30 * 60 * 1000,
    idle_timeout_ms: int = 60 * 1000,
) -> DataFrame:
    """Custom stateful STREAMING sessionizer (applyInPandasWithState +
    ProcessingTimeTimeout — the north-rule 'custom stateful operator'
    shape beyond dedup): events (user_id, ts millis) group per user;
    an event more than `gap_ms` after the previous CLOSES the session
    (closed_by='gap'); a user idle for `idle_timeout_ms` of processing
    time flushes their open session from state (closed_by='timeout'),
    so state size tracks ACTIVE users, not all users ever seen.
    Within-batch events sort by ts; cross-batch ordering is the
    stream's responsibility (use the batch operators for unordered
    backfills).

    State per user = (start, last, n) of the open session only —
    bounded, checkpointed, restart-safe.

    Trigger note: use a continuous trigger (processingTime=...) —
    trigger(availableNow=True) does NOT terminate while processing-
    time timeouts are pending, so batch-drain harnesses hang
    (observed; the streaming_exact_dedup NoTimeout op drains fine)."""
    keyed = event_stream.select(
        F.col("user_id").cast("string").alias("user_id"),
        F.col("ts").cast("long").alias("ts"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _session_fn_factory(int(gap_ms), int(idle_timeout_ms)),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
