"""Round-9 isolation benchmarks (guide §1.4): per-lane noop-sink
timings with job labels + stage metrics via the UI REST API, kept OUT
of the frozen bench.py. Each experiment is selected by argv so runs
stay short and serial (never concurrent with bench.py).

Usage: python bench_extra.py <experiment> [args]
  pdf       — extract_spans lane decomposition over the bench corpus
  web       — extract_web_docs lane decomposition
  queries   — headline JVM queries, warm best-of-3 each
  stream    — stream_web_extract wall decomposition
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARKPDF_ARROW_BATCH", "8192")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
MULT = int(os.environ.get("SPARKPDF_BENCH_MULT", "16"))


def get_ui_spark(cpus: int = CPUS):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName("bench-extra")
        .master(f"local[{cpus}]")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ["SPARKPDF_ARROW_BATCH"],
        )
        .config("spark.sql.shuffle.partitions", str(max(cpus, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "500")
        .getOrCreate()
    )


def rest(spark, path):
    base = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[-1]}"
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/{path}", timeout=30
    ) as r:
        return json.load(r)


def timed(label, spark, fn, n=3):
    """Best-of-n wall for fn() (an action), labelled in the UI."""
    spark.sparkContext.setJobDescription(label)
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    spark.sparkContext.setJobDescription(None)
    print(f"{label:45s} {best:7.3f} s")
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def _bench_corpus(spark):
    import bench

    return bench.bench_corpus(spark, SF_DIR, MULT)


def exp_pdf():
    from pyspark.sql import functions as F

    from sparkpdf.operators.extract import extract_spans, extract_stats

    spark = get_ui_spark()
    spark.sparkContext.setLogLevel("ERROR")
    corpus = _bench_corpus(spark).repartition(CPUS).persist()
    n = corpus.count()
    print(f"corpus docs: {n}")
    # warm workers
    noop(extract_spans(corpus))
    timed("A corpus count (persisted read)", spark, corpus.count)
    timed("B extract_spans -> noop", spark, lambda: noop(extract_spans(corpus)))
    timed(
        "C extract_spans -> agg err/count (bench shape)",
        spark,
        lambda: extract_spans(corpus)
        .agg(
            F.sum((F.col("error").isNotNull()).cast("long")),
            F.count("*"),
        )
        .collect(),
    )
    timed("D extract_stats -> noop (no span IPC)", spark,
          lambda: noop(extract_stats(corpus)))

    # boundary floor: ship pdf_bytes to python, do nothing, return stats
    def passthrough(batches):
        import pyarrow as pa

        for rb in batches:
            blobs = rb.column(1)
            nb = [len(b.as_py()) if b.is_valid else 0 for b in blobs]
            yield pa.RecordBatch.from_arrays(
                [rb.column(0), pa.array(nb, type=pa.int64())],
                names=["doc_id", "n_bytes"],
            )

    pt = corpus.select("doc_id", "pdf_bytes").mapInArrow(
        passthrough, schema="doc_id string, n_bytes long"
    )
    noop(pt)
    timed("E IPC floor (ship bytes, no kernel)", spark, lambda: noop(pt))
    corpus.unpersist()
    spark.stop()


def exp_web():
    from pyspark.sql import functions as F

    import bench
    from sparkpdf.operators.text import extract_web_docs, synthesize_web_corpus

    spark = get_ui_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", F.expr(f"repeat(text, {bench.TEXT_REP})").alias("text")
    )
    reps = spark.range(MULT).select(F.col("id").alias("rep"))
    docs = docs.crossJoin(reps).select(
        (F.col("doc_id") * MULT + F.col("rep")).alias("doc_id"), "text"
    )
    corpus = synthesize_web_corpus(docs).repartition(CPUS).persist()
    n = corpus.count()
    print(f"web corpus docs: {n}")
    noop(extract_web_docs(corpus))
    timed("A corpus count (persisted read)", spark, corpus.count)
    timed("B extract_web_docs -> noop", spark,
          lambda: noop(extract_web_docs(corpus)))
    timed(
        "C extract_web_docs -> agg (bench shape)",
        spark,
        lambda: extract_web_docs(corpus)
        .agg(
            F.sum((F.col("error").isNotNull()).cast("long")),
            F.count("*"),
        )
        .collect(),
    )

    # boundary floor: ship html to python, return length only
    def passthrough(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for rb in batches:
            yield pa.RecordBatch.from_arrays(
                [rb.column(0), pc.utf8_length(rb.column(1))],
                names=["doc_id", "n_chars"],
            )

    pt = corpus.select("doc_id", "html").mapInArrow(
        passthrough, schema="doc_id string, n_chars int"
    )
    noop(pt)
    timed("D IPC floor (ship html, no kernel)", spark, lambda: noop(pt))
    corpus.unpersist()
    spark.stop()


def exp_queries():
    import __spark_entry__ as entrymod

    spark = get_ui_spark()
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    names = sys.argv[2:] or [
        "extract_spans", "font_join", "obj_join", "text_agg",
        "events_window", "dedup_exact", "dedup_minhash", "dedup_simhash",
        "ann_cosine_topk", "token_count", "quality_score", "extract_stats",
    ]
    # warm like bench.py does
    queries["extract_spans"](spark, SF_DIR).limit(64).write.format(
        "noop"
    ).mode("overwrite").save()
    out = {}
    for name in names:
        fn = queries[name]
        out[name] = timed(name, spark, lambda: noop(fn(spark, SF_DIR)))
    print(json.dumps(out))
    spark.stop()


def exp_stream():
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    import bench
    from sparkpdf.operators.text import synthesize_web_corpus
    from sparkpdf.streaming.ingest import stream_web_extract

    spark = get_ui_spark()
    spark.sparkContext.setLogLevel("ERROR")
    base = os.path.join(tempfile.gettempdir(), "sparkpdf_stream_extra")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", F.expr(f"repeat(text, {bench.TEXT_REP})").alias("text")
    )
    corpus = synthesize_web_corpus(docs).select("doc_id", "html")
    for run in range(3):
        shutil.rmtree(base, ignore_errors=True)
        in_dir, out_dir, ck_dir = f"{base}/in", f"{base}/out", f"{base}/ck"
        corpus.repartition(CPUS).write.mode("overwrite").parquet(in_dir)
        t0 = time.time()
        stream_web_extract(spark, in_dir, out_dir, ck_dir).awaitTermination()
        print(f"stream wave-1 wall: {time.time() - t0:.2f} s")
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()




def exp_stages():
    """Per-stage metrics for one query via the UI REST API (the round-9
    measurement methodology: run a query under a label, then read
    /stages + taskSummary quantiles). Usage:
    python bench_extra.py stages <query_name>"""
    import __spark_entry__ as entrymod

    name = sys.argv[2] if len(sys.argv) > 2 else "extract_spans"
    spark = get_ui_spark()
    spark.sparkContext.setLogLevel("ERROR")
    q = entrymod.queries()[name]
    noop(q(spark, SF_DIR))  # warm
    timed(name, spark, lambda: noop(q(spark, SF_DIR)), n=1)
    for s in sorted(
        rest(spark, "stages?status=COMPLETE"),
        key=lambda s: -s["stageId"],
    )[:6]:
        print(
            f"stage {s['stageId']:3d} tasks={s['numCompleteTasks']:3d} "
            f"runTime={s['executorRunTime'] / 1e3:7.2f}s "
            f"cpuTime={s.get('executorCpuTime', 0) / 1e9:6.2f}s "
            f"shuffleRead={s.get('shuffleReadBytes', 0)} "
            f"{s['name'][:40]}"
        )
        ts = rest(
            spark,
            f"stages/{s['stageId']}/0/taskSummary"
            "?quantiles=0.0,0.5,1.0",
        )
        rt = ts.get("executorRunTime")
        if rt:
            print(f"          task runTime min/med/max "
                  f"{[round(x / 1e3, 3) for x in rt]}")
    spark.stop()


if __name__ == "__main__":
    {"pdf": exp_pdf, "web": exp_web, "queries": exp_queries,
     "stream": exp_stream, "stages": exp_stages}[sys.argv[1]]()
