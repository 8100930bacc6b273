"""100x-scale whale-skew experiment (round-5; r4 verdict item 7).

Re-runs the round-3 whale-salting measurement INSIDE the 100x
disk-scan harness: ~8M small docs (bench_corpus at mult=1600, the same
20.6 GB corpus as the round-3/4 sustained-scan evidence) plus N
incompressible ~200 MB whale PDFs, persisted to parquet and scanned
back (storage -> extract, the production shape). Extraction runs once
per layout:

  naive          : repartition(ceil(bytes/target), doc_id)  (hash)
  salted_scan    : plan_salted_partitions, size computed on the fly
                   (NO pushdown — each branch re-reads the corpus)
  salted_pushdown: plan_salted_partitions(size_col="n_bytes") — the
                   branch filters reach parquet stats (--layouts
                   selects a subset)

For each pass the Spark UI REST API supplies per-task executorRunTime
quantiles of the extraction stage (the stage with the largest total
executorRunTime in the pass window) -> p99/median task time, the
BASELINE skew-guard metric (target <= 2 with salting, given
target_bytes sized against the whale: an indivisible 200 MB doc can
only satisfy p99/median <= 2 when the median task also carries
~>=100 MB, so the headline run uses --target-bytes 128M).

    python scripts/whale100x.py [--mult 1600] [--whales 8]
        [--whale-mb 200] [--target-bytes 134217728] [--skip-synth]

Prints one JSON line; record the table in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARKPDF_ARROW_BATCH", "8192")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_ui_spark(cpus: int):
    """bench session + the UI REST API (sparkpdf.session disables it)."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName("whale100x")
        .master(f"local[{cpus}]")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ["SPARKPDF_ARROW_BATCH"])
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "200")
        .getOrCreate()
    )


def chain_text(seed: bytes, mb: int) -> str:
    """Incompressible text: sha256 digest chain (flate cannot shrink
    it, so the PDF really is ~mb MB on disk and in the scan)."""
    chunks = []
    need = mb << 20
    total = 0
    while total < need:
        seed = hashlib.sha256(seed).digest()
        h = seed.hex()
        chunks.append(h)
        total += len(h) + 1
    return " ".join(chunks)


def synth(spark, out_dir: str, mult: int, n_whales: int, whale_mb: int,
          whale_kind: str = "text"):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from bench import bench_corpus
    from sparkpdf.operators.extract import PDF_RAW_SCHEMA
    from sparkpdf.testing.pdfgen import doc_to_pdf, image_whale_pdf

    t0 = time.time()
    # n_bytes is MATERIALIZED at ingest: the salted-pushdown layout
    # filters on it, reaching parquet row-group stats (salting.py)
    small = bench_corpus(spark, SF_DIR, mult).select(
        "doc_id", "pdf_bytes", F.length("pdf_bytes").alias("n_bytes")
    )
    small.repartition(256).write.mode("overwrite").parquet(
        os.path.join(out_dir, "small")
    )
    t_small = time.time() - t0
    t0 = time.time()

    # whales synthesize in parallel (one task each): an incompressible
    # 200 MB chain text -> ~200 MB PDF per row
    def gen_whales(batches):
        import pandas as pd

        for pdf in batches:
            for (i,) in pdf.itertuples(index=False):
                i = int(i)
                if whale_kind == "image":
                    doc = image_whale_pdf(i, whale_mb << 20)
                else:
                    doc = doc_to_pdf(
                        chain_text(b"whale-%d" % i, whale_mb),
                        title=f"whale-{i}",
                    )
                yield pd.DataFrame(
                    {"doc_id": [f"90000000{i}"], "pdf_bytes": [doc],
                     "n_bytes": [len(doc)]}
                )

    spark.range(n_whales).repartition(n_whales, "id").mapInPandas(
        gen_whales, schema="doc_id string, pdf_bytes binary, n_bytes int"
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "whales"))
    t_whales = time.time() - t0
    return {"synth_small_sec": round(t_small, 1),
            "synth_whales_sec": round(t_whales, 1)}


def stage_task_quantiles(spark, t_start_ms: int) -> dict:
    """Find the heaviest stage completed since t_start_ms and return
    its per-task executorRunTime quantiles from the UI REST API."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def get(path):
        with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=30) as r:
            return json.loads(r.read())

    stages = get(f"applications/{app}/stages?status=complete")
    recent = [
        s for s in stages
        if s.get("firstTaskLaunchedTime")
        and _ms(s["firstTaskLaunchedTime"]) >= t_start_ms
    ]
    if not recent:
        return {}
    heavy = max(recent, key=lambda s: s.get("executorRunTime", 0))
    sid, att = heavy["stageId"], heavy["attemptId"]
    summ = get(
        f"applications/{app}/stages/{sid}/{att}/taskSummary"
        f"?quantiles=0.05,0.5,0.99,1.0"
    )
    q = summ["executorRunTime"]
    return {
        "stage_id": sid,
        "n_tasks": heavy["numCompleteTasks"],
        "task_ms_p05": q[0],
        "task_ms_p50": q[1],
        "task_ms_p99": q[2],
        "task_ms_max": q[3],
        "p99_over_median": round(q[2] / max(q[1], 1.0), 2),
    }


def _ms(iso: str) -> int:
    from datetime import datetime, timezone

    return int(
        datetime.strptime(iso.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        .astimezone(timezone.utc)
        .timestamp() * 1000
    )


def run_pass(spark, df, label: str) -> dict:
    from pyspark.sql import functions as F

    from sparkpdf.operators.extract import extract_spans

    t_start_ms = int(time.time() * 1000)
    t0 = time.time()
    stats = extract_spans(df).agg(
        F.count("*").alias("n"),
        F.sum((F.col("error").isNotNull()).cast("long")).alias("errs"),
    ).collect()[0]
    wall = time.time() - t0
    out = {
        "layout": label,
        "wall_sec": round(wall, 1),
        "docs": int(stats.n),
        "errors": int(stats.errs or 0),
    }
    try:
        out.update(stage_task_quantiles(spark, t_start_ms))
    except Exception as e:  # REST hiccup: keep the wall numbers
        out["task_metrics_error"] = str(e)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=1600)
    ap.add_argument("--whales", type=int, default=8)
    ap.add_argument("--whale-mb", type=int, default=200)
    ap.add_argument("--whale-kind", default="text", choices=["text", "image"],
                    help="text = flate-expanded tokenized whales (factor"
                         " ~3.2); image = incompressible DCT payload"
                         " (factor ~1)")
    ap.add_argument("--target-bytes", type=int, default=128 << 20)
    ap.add_argument("--big-doc-bytes", type=int, default=16 << 20)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default="/tmp/whale100x")
    ap.add_argument("--skip-synth", action="store_true")
    ap.add_argument("--layouts", default="naive,salted_scan,salted_pushdown",
                    help="comma-set of layouts to run")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sparkpdf.plans.salting import plan_salted_partitions, skew_report

    spark = get_ui_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    result = {"mult": args.mult, "whales": args.whales,
              "whale_mb": args.whale_mb, "whale_kind": args.whale_kind,
              "target_bytes": args.target_bytes}
    if not args.skip_synth:
        result.update(
            synth(spark, args.out, args.mult, args.whales, args.whale_mb,
                  args.whale_kind)
        )
    corpus = spark.read.parquet(os.path.join(args.out, "small")).unionByName(
        spark.read.parquet(os.path.join(args.out, "whales"))
    )
    total_bytes = corpus.agg(F.sum(F.length("pdf_bytes"))).collect()[0][0]
    n_parts = max(args.cpus, -(-int(total_bytes) // args.target_bytes))
    result["total_gb"] = round(total_bytes / 1e9, 2)
    result["n_naive_parts"] = n_parts
    result["skew_before"] = skew_report(corpus, n_parts)

    layouts = set(args.layouts.split(","))
    if "naive" in layouts:
        naive = corpus.repartition(n_parts, "doc_id")
        result["naive"] = run_pass(spark, naive, "naive")
    # salted_scan: size computed on the fly -> the branch filters
    # cannot push down and each branch re-reads the corpus
    if "salted_scan" in layouts:
        salted_scan = plan_salted_partitions(
            corpus.drop("n_bytes"), target_bytes=args.target_bytes,
            big_doc_bytes=args.big_doc_bytes,
        )
        result["salted_scan"] = run_pass(spark, salted_scan, "salted_scan")
    if "salted_pushdown" in layouts and "n_bytes" in corpus.columns:
        # salted_pushdown: materialized size column -> both branch
        # filters reach parquet stats (whale branch reads ~whale bytes)
        salted_pd = plan_salted_partitions(
            corpus, target_bytes=args.target_bytes,
            big_doc_bytes=args.big_doc_bytes, size_col="n_bytes",
        )
        result["salted_pushdown"] = run_pass(
            spark, salted_pd.drop("n_bytes"), "salted_pushdown"
        )
    if "salted_auto" in layouts and "n_bytes" in corpus.columns:
        # salted_auto (round 6): target_bytes derived from the
        # corpus's own whale p99 inside the planning aggregate — must
        # reproduce the hand-tuned 384 MB row's p99/p50 <= 2 without
        # tuning
        from sparkpdf.plans.salting import derive_target_bytes

        wp99 = corpus.filter(
            F.col("n_bytes") > args.big_doc_bytes
        ).agg(F.expr("percentile_approx(n_bytes, 0.99)")).collect()[0][0]
        result["auto_target_bytes"] = derive_target_bytes(wp99)
        salted_auto = plan_salted_partitions(
            corpus, target_bytes=None,
            big_doc_bytes=args.big_doc_bytes, size_col="n_bytes",
        )
        result["salted_auto"] = run_pass(
            spark, salted_auto.drop("n_bytes"), "salted_auto"
        )
    if "salted_measured" in layouts and "n_bytes" in corpus.columns:
        # salted_measured (round 7): BOTH knobs derived from the corpus
        # itself — the cost factor from sampled-whale kernel timings,
        # the target from that factor x whale p99. Must hold
        # p99/p50 <= 2 on text AND image whale corpora with no tuning.
        from sparkpdf.plans.salting import (
            derive_target_bytes,
            measure_whale_cost_factor,
        )

        t0 = time.time()
        mdetail: dict = {}
        factor = measure_whale_cost_factor(
            corpus, big_doc_bytes=args.big_doc_bytes, size_col="n_bytes",
            detail=mdetail,
        )
        result["measure_sec"] = round(time.time() - t0, 1)
        result["measured_factor"] = round(factor, 3) if factor else None
        result["measure_detail"] = mdetail
        wp99 = corpus.filter(
            F.col("n_bytes") > args.big_doc_bytes
        ).agg(F.expr("percentile_approx(n_bytes, 0.99)")).collect()[0][0]
        result["measured_target_bytes"] = (
            derive_target_bytes(wp99, factor) if factor else None
        )
        salted_m = plan_salted_partitions(
            corpus, target_bytes=None, big_doc_bytes=args.big_doc_bytes,
            size_col="n_bytes", whale_cost_factor=factor,
        )
        result["salted_measured"] = run_pass(
            spark, salted_m.drop("n_bytes"), "salted_measured"
        )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
