"""Event sessionization — gap-based sessions over the events table.

Batch analog of the stateful-streaming shape (the reference has no
streaming, SURVEY §2.14; this is training-pipeline breadth): a session
breaks when a user is idle longer than `gap`. Implementation is the
standard lag + conditional-cumsum window pair — two shuffles on
user_id only, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_s = gap_minutes * 60
    flagged = events.select(
        "user_id",
        "ts",
        "event_type",
        F.when(
            F.unix_timestamp(F.col("ts").cast("timestamp"))
            - F.lag(F.unix_timestamp(F.col("ts").cast("timestamp"))).over(w)
            > gap_s,
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    with_sess = flagged.withColumn(
        "session_idx", F.sum("is_new").over(w).cast("int")
    )
    return (
        with_sess.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("t_start"),
            F.max("ts").alias("t_end"),
        )
    )
