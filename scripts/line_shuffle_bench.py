"""Line-dedup join-back payload: shuffle-volume measurement (round 7;
r6 verdict nit 3).

The r6 shape shipped every occurrence's full LINE TEXT through the
hot-hash join-back (`hashed.join(firsts, "h")` with `line` in the
projection): a million-occurrence boilerplate line lands its text a
million times in one join partition. The r7 shape hashes map-side,
drops the text before anything shuffles on h, and rebuilds kept text
doc-side from dropped positions. This experiment MEASURES the
difference at sf0.1 in two shapes:

  text_join : r6 — (doc_id, pos, line, h) through groupBy(h) + join
  slim_join : r7 — (doc_id, pos, h) only; doc-side rebuild
              (= remove_duplicate_lines as shipped)

Both produce identical output (asserted row-for-row). Per-pass shuffle
read/write bytes come from the Spark UI REST API (sum over the stages
launched in the pass window), normalized to bytes per line occurrence.

The DEFAULT corpus is synthetic and shaped like the concern: long
lines (~96 B — real boilerplate is 50-200 B), a hot Zipf-ish
boilerplate pool plus per-(doc,pos) unique lines, and enough DISTINCT
lines that the `firsts` aggregate cannot broadcast (at 100 TB it never
could; letting AQE broadcast it here would measure a join that does
not exist at scale). `--real` instead splits the sf0.1 documents on
spaces — 6-byte "lines", where the slim tuple (doc_id, pos, h ~ 20 B)
is BIGGER than the text it replaces: the measured crossover, recorded
honestly in BENCH/BASELINE.md (payload cut pays iff avg line bytes >
tuple overhead).

    python scripts/line_shuffle_bench.py [--real] [--docs N]

Prints one JSON line; record the table in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from substring_shuffle_bench import _stage_totals  # noqa: E402
from whale100x import get_ui_spark  # noqa: E402


def variant_text_join(documents, sep="\n"):
    """The round-6 shape, reconstructed: line text rides the h-keyed
    groupBy and join-back; reassembly is a groupBy(doc_id) over
    (pos, line) pairs."""
    import re

    from pyspark.sql import functions as F

    docs = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split("text", re.escape(sep), -1)).alias(
            "pos", "line"
        ),
    )
    hashed = lines.withColumn("h", F.xxhash64("line"))
    firsts = hashed.groupBy("h").agg(
        F.min(F.struct("doc_id", "pos")).alias("first")
    )
    kept = (
        hashed.join(firsts, "h")
        .filter(
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("pos") == F.col("first.pos"))
        )
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
            ).alias("text"),
            F.count("*").alias("n_kept"),
        )
    )
    totals = lines.groupBy("doc_id").agg(F.count("*").alias("n_lines"))
    return (
        docs.select("doc_id")
        .join(kept, "doc_id", "left")
        .join(totals, "doc_id")
        .select(
            "doc_id",
            F.coalesce("text", F.lit("")).alias("text"),
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
            .cast("int")
            .alias("n_dropped_lines"),
        )
    )


def variant_slim_join(documents, sep="\n"):
    from sparkpdf.operators.dedup import remove_duplicate_lines

    return remove_duplicate_lines(documents, sep)


def synth_boilerplate_corpus(spark, out_dir: str, n_docs: int,
                             lines_per_doc: int, pool: int,
                             uniq_permille: int) -> None:
    """Deterministic boilerplate-heavy corpus, written to parquet (a
    cached input defeats AQE exchange reuse — round-6 lesson). Each
    line is 96 B (3x md5 hex). Line (d, i) is UNIQUE with probability
    uniq_permille/1000 (hash-decided), else drawn from a `pool`-sized
    boilerplate set with a quadratic skew toward low pool ids — the
    hot head a million-occurrence footer line creates in the wild."""
    from pyspark.sql import functions as F

    def line96(n):
        """96-char deterministic line keyed by a long column."""
        return F.concat_ws(
            "",
            F.md5((n * 3).cast("string")),
            F.md5((n * 3 + 1).cast("string")),
            F.md5((n * 3 + 2).cast("string")),
        )

    d = F.col("id")
    occ = d * lines_per_doc  # occ + i = global occurrence number
    line = F.transform(
        F.sequence(F.lit(0), F.lit(lines_per_doc - 1)),
        lambda i: F.when(
            F.pmod(F.xxhash64(occ + i, F.lit(7)), 1000) < uniq_permille,
            line96(occ + i + 1_000_000_000),  # unique namespace
        ).otherwise(
            # pool id = floor(pool * u^2 / 1e6), u in [0,1000):
            # quadratic skew, id 0 hottest — the footer-line head
            line96(
                F.floor(
                    F.pow(
                        F.pmod(F.xxhash64(occ + i, F.lit(11)), 1000), 2
                    )
                    * pool
                    / 1_000_000
                ).cast("long")
            )
        ),
    )
    (
        spark.range(n_docs, numPartitions=32)
        .select(
            d.alias("doc_id"), F.concat_ws("\n", line).alias("text")
        )
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--real", action="store_true",
                    help="measure on sf documents split on spaces "
                         "(6-byte lines) instead of the synthetic "
                         "long-line boilerplate corpus")
    ap.add_argument("--docs", type=int, default=40000)
    ap.add_argument("--lines-per-doc", type=int, default=100)
    ap.add_argument("--pool", type=int, default=1000)
    ap.add_argument("--uniq-permille", type=int, default=300)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sep", default=" ")  # --real mode: documents
    # have few \n; space-separated "lines" (words) give a dense
    # occurrence stream with TINY payloads — the crossover control
    args = ap.parse_args()

    from pyspark.sql import functions as F

    spark = get_ui_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    if args.real:
        docs = spark.read.parquet(
            os.path.join(args.sf, "documents.parquet")
        ).select("doc_id", "text")
        corpus_desc = args.sf
    else:
        args.sep = "\n"
        corpus_dir = "/tmp/line_bench_corpus"
        synth_boilerplate_corpus(
            spark, corpus_dir, args.docs, args.lines_per_doc,
            args.pool, args.uniq_permille,
        )
        docs = spark.read.parquet(corpus_dir)
        corpus_desc = (
            f"synthetic {args.docs}x{args.lines_per_doc} 96B-lines "
            f"pool={args.pool} uniq={args.uniq_permille}/1000"
        )
    n_docs = docs.count()
    occurrences = docs.agg(
        F.sum(F.size(F.split("text", args.sep, -1)))
    ).collect()[0][0]
    result = {"corpus": corpus_desc, "docs": n_docs,
              "line_occurrences": int(occurrences), "sep": args.sep,
              "variants": {}}
    baseline = None
    for name, fn in [
        ("text_join", variant_text_join),
        ("slim_join", variant_slim_join),
    ]:
        t_start_ms = int(time.time() * 1000)
        t0 = time.time()
        # engine-side checksum: collecting 100s of MB of text would
        # dominate the wall and measure the driver, not the dedup
        chk = (
            fn(docs, args.sep)
            .agg(
                F.expr(
                    "bit_xor(xxhash64(doc_id, text, n_dropped_lines))"
                ).alias("chk"),
                F.count("*").alias("n"),
                F.sum("n_dropped_lines").alias("dropped"),
            )
            .collect()[0]
        )
        wall = time.time() - t0
        rows = (chk.chk, chk.n, chk.dropped)
        if baseline is None:
            baseline = rows
        assert rows == baseline, f"{name} output differs: {rows} vs {baseline}"
        rec = {"wall_sec": round(wall, 1), "n_docs_out": int(chk.n),
               "lines_dropped": int(chk.dropped)}
        rec.update(_stage_totals(spark, t_start_ms))
        rec["shuffle_write_bytes_per_occurrence"] = round(
            rec["shuffle_write_mb"] * 1e6 / max(int(occurrences), 1), 1
        )
        result["variants"][name] = rec
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
