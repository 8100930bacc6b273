"""Byte-size-aware salting — the north rule's skew defence.

A 100 TB corpus mixes 4 KB docs with 200 MB docs; hash-partitioning on
doc_id alone gives p99/median task-time >> 2 once a partition catches
two whales. This planner repartitions so that (a) every partition
targets ~`target_bytes` of PDF payload and (b) each oversized doc lands
in a partition of its own (SURVEY.md §4.3).

Two-pass by design: one cheap aggregate over byte lengths (metadata-ish
scan; Parquet reads only the length column), then one explicit
repartition. The shuffle it introduces is the point — it replaces the
pathological skewed shuffle downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_TARGET_BYTES = 64 << 20  # ~64 MB of raw PDF per task
DEFAULT_BIG_DOC_BYTES = 16 << 20  # docs above this get private partitions


# measured at 27 GB (BENCH/BASELINE.md rounds 5-6): ~384 MB of small
# docs cost the same end-to-end task wall as one whale whose PDF is
# ~121 MB on disk (200 MB of incompressible text, ~0.6x flate inside
# the PDF container). Parse is FASTER per byte on giants; the gap is
# the whale partition's incompressible shuffle + indivisibility. The
# factor is expressed against the SIZE COLUMN the planner reads
# (pdf_bytes / n_bytes), so: target ~= whale_p99_bytes x 3.2
# (384/121). A first round-6 attempt derived 1.9 from the whale's
# TEXT size — wrong basis, measured p99/p50 2.23 (> 2 bar); 3.2
# against pdf bytes reproduces the hand-tuned 384 MB row.
WHALE_COST_FACTOR = 3.2


def derive_target_bytes(
    whale_p99: int | None, whale_cost_factor: float = WHALE_COST_FACTOR
) -> int:
    """The auto-target rule, measured in the whale100x runs: size
    small-doc partitions against the p99 whale's task COST — p99 whale
    bytes (the on-disk SIZE COLUMN the planner reads) x ~3.2 — never
    below the default target. With no whales, the default stands. The
    rejected first attempt (x1.9 against whale TEXT size) measured
    p99/p50 2.23; see WHALE_COST_FACTOR above."""
    return max(DEFAULT_TARGET_BYTES, int((whale_p99 or 0) * whale_cost_factor))


def plan_salted_partitions(
    pdf_raw: DataFrame,
    target_bytes: int | None = DEFAULT_TARGET_BYTES,
    big_doc_bytes: int = DEFAULT_BIG_DOC_BYTES,
    min_partitions: int = 4,
    size_col: str | None = None,
    whale_cost_factor: float = WHALE_COST_FACTOR,
) -> DataFrame:
    """Returns pdf_raw repartitioned by a byte-aware salt column.

    salt ∈ [0, n_small) for normal docs via hash(doc_id);
    salt ∈ [n_small, n_small + n_big) gives each big doc its own slot.

    `target_bytes=None` AUTO-DERIVES the target from the corpus's own
    size stats (round-6; the round-5 whale100x run showed a hand-tuned
    128 MB target leaves p99/p50 ~ 4 because a whale task is ~2 small
    waves of indivisible work): target = max(DEFAULT_TARGET_BYTES,
    p99 whale bytes x whale_cost_factor), computed inside the SAME
    planning aggregate that sizes the partitions (no extra pass).
    With no whales present the default target stands.

    `size_col`: name of a MATERIALIZED per-doc byte-size column in the
    source table. The two-branch union below filters the corpus twice
    (small side, big side); with an on-the-fly length(pdf_bytes) those
    filters cannot push down, so the plan re-reads the full corpus
    once per branch — measured at 27 GB this costs more wall than the
    whale skew it cures (BENCH/BASELINE.md round 5). With a size
    column written at ingest, both filters reach the parquet
    row-group/file statistics: the big branch reads ~only the whale
    bytes and the planning aggregate reads one slim column. At 100 TB
    the size column is REQUIRED; the computed fallback stays for ad
    hoc runs."""
    if size_col:
        # filter on the RAW column (no cast wrapper): Spark only
        # pushes attribute-vs-literal predicates down to the parquet
        # reader, which is the whole point of the size column
        sized = pdf_raw.withColumn(
            "_doc_bytes", F.col(size_col).cast("long")
        )
        small_pred = F.col(size_col) <= big_doc_bytes
        big_pred = F.col(size_col) > big_doc_bytes
    else:
        sized = pdf_raw.withColumn(
            "_doc_bytes", F.length("pdf_bytes").cast("long")
        )
        small_pred = F.col("_doc_bytes") <= big_doc_bytes
        big_pred = F.col("_doc_bytes") > big_doc_bytes
    stats = sized.agg(
        F.coalesce(
            F.sum(F.when(F.col("_doc_bytes") <= big_doc_bytes, F.col("_doc_bytes"))),
            F.lit(0),
        ).alias("small_bytes"),
        F.coalesce(
            F.sum((F.col("_doc_bytes") > big_doc_bytes).cast("int")), F.lit(0)
        ).alias("n_big"),
        F.percentile_approx(
            F.when(F.col("_doc_bytes") > big_doc_bytes, F.col("_doc_bytes")),
            0.99,
        ).alias("whale_p99"),
    ).collect()[0]
    if target_bytes is None:
        target_bytes = derive_target_bytes(stats.whale_p99, whale_cost_factor)
    n_small = max(min_partitions, -(-int(stats.small_bytes) // target_bytes))
    n_big = int(stats.n_big)
    # NOTE: repartition(n, col) HASHES the column, so one shared
    # repartition cannot pin whales to private partitions (hash
    # collisions with small-doc salts). Instead each side is
    # partitioned separately and unioned — UnionExec concatenates
    # child partitions without a shuffle, preserving both layouts.
    small = (
        sized.filter(small_pred)
        .repartition(n_small, "doc_id")
        .drop("_doc_bytes")
    )
    if not n_big:
        return small
    # range-partitioning n_big distinct keys into n_big partitions
    # gives exactly one whale per partition (full sample at this size)
    big = (
        sized.filter(big_pred)
        .repartitionByRange(n_big, "doc_id")
        .drop("_doc_bytes")
    )
    return small.unionByName(big)


def skew_report(pdf_raw: DataFrame, n_partitions: int) -> dict:
    """p99/median bytes per would-be partition — the BASELINE skew-guard
    metric (target <= 2 after salting)."""
    per_part = (
        pdf_raw.withColumn("_p", F.pmod(F.hash("doc_id"), F.lit(n_partitions)))
        .groupBy("_p")
        .agg(F.sum(F.length("pdf_bytes")).alias("part_bytes"))
    )
    row = per_part.agg(
        F.expr("percentile_approx(part_bytes, 0.99)").alias("p99"),
        F.expr("percentile_approx(part_bytes, 0.5)").alias("p50"),
    ).collect()[0]
    p99, p50 = float(row.p99 or 0), float(row.p50 or 1)
    return {"p99_bytes": p99, "median_bytes": p50, "skew_ratio": p99 / max(p50, 1.0)}
