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
