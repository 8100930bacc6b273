"""Verify-stage shuffle measurement (round 8, r7 verdict item 4):
legacy full-array jaccard verify vs the bounded-signature verify
(dedup._bounded_jaccard_verify) on a whale-augmented replica corpus.

Corpus: sf documents replicated R times with remapped ids (every
replica an exact near-dup of its base -> real candidate pairs), and
every (base % whale_every == 0) doc carries a `whale_tokens`-token
unique tail shared by its replicas — the long-doc shape whose token
arrays the legacy verify ships once per candidate pair.

Measures, per mode: wall seconds and total shuffle-write bytes of all
stages launched during the run (Spark UI REST, the whale100x recipe),
and asserts the cluster outputs are IDENTICAL (the bounded path's
contract: same decisions, smaller payload).

    python scripts/verify_shuffle_bench.py [--sf /root/testdata/sf0.01]
        [--replicas 2] [--whale-every 10] [--whale-tokens 20000]
        [--cpus 8]

Prints one JSON line per mode; record the table in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whale100x import _ms, get_ui_spark  # noqa: E402 (sibling import)


def shuffle_bytes_since(spark, t_start_ms: int) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete",
        timeout=30,
    ) as r:
        stages = json.loads(r.read())
    return sum(
        s.get("shuffleWriteBytes", 0)
        for s in stages
        if s.get("firstTaskLaunchedTime")
        and _ms(s["firstTaskLaunchedTime"]) >= t_start_ms
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--replicas", type=int, default=2)
    ap.add_argument("--whale-every", type=int, default=10)
    ap.add_argument("--whale-tokens", type=int, default=20000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--k-sig", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sparkpdf.operators.dedup import dup_clusters

    os.environ.setdefault("SPARKPDF_ARROW_BATCH", "8192")
    spark = get_ui_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(
        os.path.join(args.sf, "documents.parquet")
    ).select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    # whale tail: unique tokens keyed by the BASE id so replicas share
    # it (the pair stays an exact dup) — built as a JVM expression
    tail = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(args.whale_tokens - 1)),
            lambda i: F.concat(
                F.lit("w"), F.col("doc_id").cast("string"),
                F.lit("x"), i.cast("string")),
        ),
    )
    whaled = base.select(
        "doc_id",
        F.when(F.col("doc_id") % args.whale_every == 0,
               F.concat("text", F.lit(" "), tail))
        .otherwise(F.col("text")).alias("text"),
    )
    corpus = None
    for r in range(args.replicas):
        rep = whaled.select(
            (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
            "text",
        )
        corpus = rep if corpus is None else corpus.unionByName(rep)
    corpus_path = "/tmp/verify_shuffle_corpus"
    corpus.write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    outputs = {}
    for mode, k in (("full_arrays", None), ("bounded_sig", args.k_sig)):
        t0 = time.time()
        t0_ms = int(t0 * 1000)
        rows = dup_clusters(
            corpus, jaccard_threshold=0.9, verify_sig_tokens=k
        ).collect()
        wall = time.time() - t0
        sh = shuffle_bytes_since(spark, t0_ms)
        outputs[mode] = sorted((r.doc_id, r.cluster_id) for r in rows)
        print(json.dumps({
            "mode": mode,
            "k_sig": k,
            "docs": len(rows),
            "clusters": len({c for _, c in outputs[mode]}),
            "wall_sec": round(wall, 1),
            "shuffle_mb": round(sh / 1e6, 1),
        }), flush=True)
    assert outputs["full_arrays"] == outputs["bounded_sig"], \
        "bounded verify changed the cluster output"
    print(json.dumps({"outputs_identical": True}))
    spark.stop()


if __name__ == "__main__":
    main()
