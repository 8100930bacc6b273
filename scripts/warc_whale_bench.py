"""WARC-lane whale experiment (round 8, r7 verdict item 6): the web
lane's whales are archives — a .warc.gz can be GBs while its
neighbors are MBs — so the extract_job salting rule must hold with
THIS lane's kernel (gunzip + WARC demux + one-pass DOM extraction),
not the PDF parser the 27 GB whale100x runs certified.

Corpus: `--small` archives of ~`--small-mb` MB (each n pages of
incompressible hex text wrapped in the standard synthetic page) plus
`--whales` archives of `--whale-mb` MB, written as (doc_id,
warc_bytes, n_bytes) parquet — the drop-zone shape, with the
materialized size column the planner needs for pushdown.

Runs the full demux+extract count twice — naive hash partitioning
vs plan_salted_partitions(target_bytes=None, whale_cost_factor=None:
measured by the contended probe with the WARC workload) — and
reports per-task p99/p50 quantiles of the heaviest stage (UI REST,
the whale100x recipe). Bar: p99/p50 <= 2 after salting.

    python scripts/warc_whale_bench.py [--small 1200] [--small-mb 4]
        [--whales 2] [--whale-mb 384] [--cpus 32]

Prints JSON lines; record in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from whale100x import get_ui_spark, stage_task_quantiles  # noqa: E402


def hex_text(seed: bytes, mb: float) -> str:
    """Incompressible text (sha256 chain) so gzip can't shrink the
    archive below its nominal size."""
    chunks, total, need = [], 0, int(mb * (1 << 20))
    while total < need:
        seed = hashlib.sha256(seed).digest()
        chunks.append(seed.hex())
        total += 65
    return " ".join(chunks)


def build_archive(doc_id: int, n_pages: int, page_mb: float) -> bytes:
    from sparkpdf.kernels.html import synthesize_webpage
    from sparkpdf.kernels.warc import build_warc

    records = []
    for p in range(n_pages):
        html = synthesize_webpage(
            doc_id * 100000 + p,
            hex_text(b"%d-%d" % (doc_id, p), page_mb),
        )
        records.append({
            "warc_type": "response",
            "record_id": f"<urn:uuid:{doc_id}-{p}>",
            "target_uri": f"https://w{doc_id}.example.com/p{p}",
            "http_status": 200,
            "http_content_type": "text/html; charset=utf-8",
            "body": html.encode("latin-1", "replace"),
        })
    return build_warc(records, gzip_members=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=1200)
    ap.add_argument("--small-mb", type=float, default=4.0)
    ap.add_argument("--whales", type=int, default=2)
    ap.add_argument("--whale-mb", type=float, default=384.0)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--batches", type=int, default=64)
    ap.add_argument("--out", default="/tmp/warc_whale_corpus")
    ap.add_argument("--skip-synth", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("SPARKPDF_ARROW_BATCH", "8192")
    spark = get_ui_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from sparkpdf.operators.text import extract_web_docs
    from sparkpdf.plans.salting import plan_salted_partitions
    from sparkpdf.sources.warc_source import warc_pages

    if not args.skip_synth:
        t0 = time.time()
        # small archives: ~small_mb each, 8 pages
        def gen_small(batches):
            import pandas as pd

            for pdf in batches:
                for (i,) in pdf.itertuples(index=False):
                    b = build_archive(int(i), 8, args.small_mb / 8)
                    yield pd.DataFrame({
                        "doc_id": [f"small-{int(i)}"],
                        "warc_bytes": [b],
                        "n_bytes": [len(b)],
                    })

        def gen_whale(batches):
            import pandas as pd

            for pdf in batches:
                for (i,) in pdf.itertuples(index=False):
                    b = build_archive(900000 + int(i), 96,
                                      args.whale_mb / 96)
                    yield pd.DataFrame({
                        "doc_id": [f"whale-{int(i)}"],
                        "warc_bytes": [b],
                        "n_bytes": [len(b)],
                    })

        schema = "doc_id string, warc_bytes binary, n_bytes long"
        spark.range(args.small).repartition(args.cpus * 4, "id") \
            .mapInPandas(gen_small, schema=schema) \
            .write.mode("overwrite").parquet(args.out + "/small")
        spark.range(args.whales).repartition(args.whales, "id") \
            .mapInPandas(gen_whale, schema=schema) \
            .write.mode("overwrite").parquet(args.out + "/whale")
        print(json.dumps({"synth_sec": round(time.time() - t0, 1)}),
              flush=True)

    corpus = spark.read.parquet(args.out + "/small").unionByName(
        spark.read.parquet(args.out + "/whale"))
    total_mb = corpus.agg(F.sum("n_bytes")).collect()[0][0] / 1e6
    print(json.dumps({"corpus_mb": round(total_mb, 1)}), flush=True)

    def workload(frame):
        pages = warc_pages(frame).filter(
            "error IS NULL AND http_status = 200 AND html IS NOT NULL"
        ).select("doc_id", "html")
        return extract_web_docs(pages)

    for mode in ("naive", "salted"):
        if mode == "naive":
            frame = corpus.repartition(args.batches, "doc_id")
        else:
            detail: dict = {}
            from sparkpdf.plans.salting import measure_whale_cost_factor

            t0 = time.time()
            factor = measure_whale_cost_factor(
                corpus, big_doc_bytes=64 << 20, size_col="n_bytes",
                payload_col="warc_bytes", workload=workload,
                detail=detail,
            )
            probe_sec = time.time() - t0
            print(json.dumps({"measured_factor": factor,
                              "probe_sec": round(probe_sec, 1),
                              "probe_detail": detail}), flush=True)
            frame = plan_salted_partitions(
                corpus, target_bytes=None, big_doc_bytes=64 << 20,
                size_col="n_bytes", payload_col="warc_bytes",
                whale_cost_factor=factor,
            )
        t0 = time.time()
        t0_ms = int(t0 * 1000)
        n = workload(frame).agg(F.count("*")).collect()[0][0]
        wall = time.time() - t0
        q = stage_task_quantiles(spark, t0_ms)
        print(json.dumps({"mode": mode, "pages": n,
                          "wall_sec": round(wall, 1), **q}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
