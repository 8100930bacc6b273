"""Dedup volume harness: minhash_lsh_pairs + overflow accounting at
replicated corpus volumes (rounds 4-6; the published 5k/50k numbers in
BENCH/BASELINE.md were ad hoc — this makes the measurement repeatable
and adds larger decades).

The corpus is sf0.1's documents replicated R times with remapped
doc_ids — every replica is an EXACT near-duplicate of its source, so
band buckets grow linearly with R and the uncapped candidate
self-join would grow as R^2: precisely the degenerate-blob regime the
bucket_cap guard exists for. The interesting questions per volume:
how many pairs survive the cap, how many buckets overflow (excluded
AND reported, never silently dropped), and whether wall tracks the
OUTPUT cardinality rather than docs^2.

    python scripts/dedup_volume.py [--sf /root/testdata/sf0.1] \
        [--replicas 1 10 100] [--cap 10000] [--cpus 32]

Prints one JSON line per volume; record the table in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, nargs="+", default=[1, 10, 100])
    ap.add_argument("--cap", type=int, default=10000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sparkpdf.operators.dedup import (
        _minhash_buckets,
        minhash_lsh_overflow,
        minhash_lsh_pairs,
    )
    from sparkpdf.session import get_spark

    spark = get_spark(app_name="dedup-volume", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(
        os.path.join(args.sf, "documents.parquet")
    ).select(F.col("doc_id").cast("long").alias("doc_id"), "text")

    for r in args.replicas:
        reps = [
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                "text",
            )
            for i in range(r)
        ]
        corpus = reps[0]
        for d in reps[1:]:
            corpus = corpus.unionByName(d)
        corpus = corpus.repartition(args.cpus * 2, "doc_id")
        n_docs = corpus.count()
        # one bucket pass shared by pairs and the overflow report
        # (the round-6 curate_job shape)
        from pyspark import StorageLevel

        buckets = _minhash_buckets(corpus).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        t0 = time.time()
        n_pairs = minhash_lsh_pairs(
            corpus, bucket_cap=args.cap, buckets=buckets
        ).count()
        wall = time.time() - t0
        overflow = minhash_lsh_overflow(
            bucket_cap=args.cap, buckets=buckets
        ).collect()
        buckets.unpersist()
        print(json.dumps({
            "replicas": r,
            "docs": n_docs,
            "cap": args.cap,
            "pairs": n_pairs,
            "overflow_buckets": len(overflow),
            "overflow_rows": sum(int(x.bucket_n) for x in overflow),
            "pairs_wall_sec": round(wall, 1),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
