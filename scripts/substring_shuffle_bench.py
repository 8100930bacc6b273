"""Exact-substring dedup: shuffle-volume measurement (round-5; r4
verdict stretch item 9).

The r4 verdict hypothesized the gram pipeline "shuffles ~L bytes per
text position (L=40 amplification)" and proposed a sorted-suffix
rewrite to cut shuffle ~L x. This experiment MEASURES the duplication-
detection stage's shuffle volume at sf0.1 in three shapes:

  text_window : count over Window.partitionBy(gram TEXT)    — the naive
                shape the L x-amplification claim describes
  hash_window : count over Window.partitionBy(xxhash64(g))  — the r4
                implementation
  hash_groupby: groupBy(xxhash64(g)) partial agg + semi-join — the r5
                implementation (skew-safe)

All three produce identical range output (asserted). Per-pass shuffle
read/write bytes come from the Spark UI REST API (sum over the stages
launched in the pass window), normalized to bytes per gram position.

    python scripts/substring_shuffle_bench.py [--sf /root/testdata/sf0.1]

Prints one JSON line; record the table in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whale100x import get_ui_spark  # noqa: E402  (sibling script)


def _rest(spark, path):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/{path}", timeout=30
    ) as r:
        return json.loads(r.read())


def _stage_totals(spark, t_start_ms):
    from whale100x import _ms

    stages = [
        s for s in _rest(spark, "stages?status=complete")
        if s.get("firstTaskLaunchedTime")
        and _ms(s["firstTaskLaunchedTime"]) >= t_start_ms
    ]
    return {
        "n_stages": len(stages),
        "shuffle_write_mb": round(
            sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 2
        ),
        "shuffle_read_mb": round(
            sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6, 2
        ),
    }


def _grams(documents, L):
    # char-array slice shape (the linearized round-5 form — substr at
    # a char offset is O(offset), see BENCH/BASELINE.md); shuffle
    # volumes are unaffected by the enumeration shape
    from pyspark.sql import functions as F

    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.split("text", "").alias("cs"),
    ).select(
        "doc_id",
        F.posexplode(
            F.when(
                F.size("cs") >= L,
                F.transform(
                    F.sequence(F.lit(0), F.size("cs") - L),
                    lambda i: F.array_join(F.slice("cs", i + 1, F.lit(L)), ""),
                ),
            ).otherwise(F.array())
        ).alias("pos", "g"),
    )


def _ranges_from_dup(dup, L):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        dup.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            "boundary",
            F.when(
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") > L),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("gid", F.sum("boundary").over(w))
        .groupBy("doc_id", "gid")
        .agg(
            F.min("pos").cast("int").alias("range_start"),
            (F.max("pos") + L).cast("int").alias("range_end"),
        )
        .drop("gid")
    )


def variant_text_window(documents, L):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    g = _grams(documents, L)
    dup = (
        g.withColumn("n", F.count("*").over(Window.partitionBy("g")))
        .filter(F.col("n") > 1)
        .select("doc_id", "pos")
    )
    return _ranges_from_dup(dup, L)


def variant_hash_window(documents, L):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    g = _grams(documents, L).withColumn("h", F.xxhash64("g"))
    dup = (
        g.withColumn("n", F.count("*").over(Window.partitionBy("h")))
        .filter(F.col("n") > 1)
        .select("doc_id", "pos")
    )
    return _ranges_from_dup(dup, L)


def variant_hash_groupby(documents, L):
    from sparkpdf.operators.dedup import duplicate_substring_ranges

    return duplicate_substring_ranges(documents, L)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--min-len", type=int, default=40)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    spark = get_ui_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(
        os.path.join(args.sf, "documents.parquet")
    ).select("doc_id", "text").cache()
    n_docs = docs.count()
    positions = docs.agg(
        F.sum(F.greatest(F.length("text") - (args.min_len - 1), F.lit(0)))
    ).collect()[0][0]
    result = {"sf": args.sf, "docs": n_docs, "gram_positions": int(positions),
              "min_len": args.min_len, "variants": {}}
    baseline_rows = None
    for name, fn in [
        ("text_window", variant_text_window),
        ("hash_window", variant_hash_window),
        ("hash_groupby", variant_hash_groupby),
    ]:
        t_start_ms = int(time.time() * 1000)
        t0 = time.time()
        rows = sorted(
            (r.doc_id, r.range_start, r.range_end)
            for r in fn(docs, args.min_len).collect()
        )
        wall = time.time() - t0
        if baseline_rows is None:
            baseline_rows = rows
        assert rows == baseline_rows, f"{name} output differs"
        rec = {"wall_sec": round(wall, 1), "n_ranges": len(rows)}
        rec.update(_stage_totals(spark, t_start_ms))
        rec["shuffle_write_bytes_per_pos"] = round(
            rec["shuffle_write_mb"] * 1e6 / max(int(positions), 1), 1
        )
        result["variants"][name] = rec
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
