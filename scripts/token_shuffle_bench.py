"""Token-frequency scoring: shuffle-volume measurement (round-6;
r5 verdict item 1).

The r5 verdict flagged the corpus-frequency joins in
token_rarity_score / bigram_surprisal as "the last content-keyed full
shuffle in the pipeline": at sf0.01 AQE broadcasts the vocabulary, but
on a web-scale corpus the distinct-token table exceeds the broadcast
threshold and every token OCCURRENCE reshuffles on token text (hot
stopwords = skew). This experiment MEASURES the per-token shuffle
volume of three shapes at sf0.1:

  occ_join  : explode -> join(freq, tok) over raw occurrences — the
              round-5 implementation (the shape the verdict flagged)
  tf_join   : groupBy(doc_id, tok) term counts first, then
              join(freq, tok) — collapses stopword repeats before any
              content-keyed shuffle
  head_tail : the round-6 implementation (token_rarity_score):
              ONE (doc_id, tok) exchange reused by vocabulary count +
              head branch + tail branch; vocabulary HEAD broadcast
              with precomputed scores; only rare-token term counts
              join on token text. Measured twice: default budget
              (threshold inactive at this sf -> all-head, zero
              content-keyed shuffle) and a forced split
              (head_budget=200 -> real head + tail traffic).

All shapes produce identical (doc_id, rarity, n_tokens) output
(asserted). To make the occurrence shuffle actually happen in the
small-sf harness the vocabulary broadcast is disabled for the two
legacy shapes (autoBroadcastJoinThreshold=-1) — that is exactly the
at-scale regime the verdict describes; the head_tail shape keeps its
explicit broadcast()s, which ignore the threshold, so the comparison
is legacy-at-scale vs round-6-at-scale. Per-pass shuffle read/write
bytes come from the Spark UI REST API (sum over stages launched in
the pass window), normalized to bytes per token occurrence.

The sf corpora are far too small for this measurement (sf0.01 is 27k
tokens — per-stage fixed overhead swamps the signal), so by default
the script generates a deterministic Zipfian corpus (inverse-CDF
V^uniform rank sampling from xxhash64(doc_id, i) — p(rank) ~ 1/rank,
i.e. real stopword skew) at --docs x --doc-len tokens; pass --sf to
measure a parquet corpus instead.

    python scripts/token_shuffle_bench.py [--docs 20000 --doc-len 1000]

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

from whale100x import get_ui_spark, stage_task_quantiles  # noqa: E402


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


def _toks(documents):
    from pyspark.sql import functions as F
    from sparkpdf.operators.text import _tokens

    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(_tokens("text")).alias("tok"),
    )


def _scan_total(documents):
    from pyspark.sql import functions as F
    from sparkpdf.operators.text import _tokens

    return documents.agg(
        F.sum(F.size(_tokens("text")))
    ).collect()[0][0] or 1


def variant_occ_join(documents):
    """The round-5 shape: raw occurrence stream joins freq on tok."""
    from pyspark.sql import functions as F

    toks = _toks(documents)
    freq = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = _scan_total(documents)
    micro = F.round(
        -F.log10(F.col("cnt") / F.lit(float(total))) * 1e6
    ).cast("long")
    return (
        toks.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(micro) / (F.count("*") * F.lit(1e6)), 6)
            .alias("rarity"),
            F.count("*").alias("n_tokens"),
        )
    )


def variant_tf_join(documents):
    """Intermediate shape: collapse to per-doc term counts first,
    then join the (smaller, but still content-keyed) table on tok."""
    from pyspark.sql import functions as F

    tf = _toks(documents).groupBy("doc_id", "tok").agg(
        F.count("*").alias("n_occ")
    )
    freq = tf.groupBy("tok").agg(F.sum("n_occ").alias("cnt"))
    total = _scan_total(documents)
    micro = F.round(
        -F.log10(F.col("cnt") / F.lit(float(total))) * 1e6
    ).cast("long")
    return (
        tf.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(micro * F.col("n_occ"))
                / (F.sum("n_occ") * F.lit(1e6)),
                6,
            ).alias("rarity"),
            F.sum("n_occ").alias("n_tokens"),
        )
    )


def _synth_zipf(spark, n_docs, doc_len, vocab, burst):
    """Deterministic Zipfian corpus with word burstiness: token rank
    r for position i of doc d is floor(vocab ** u) with
    u = uniform-from-xxhash64(d, i mod burst) — p(rank) ~ 1/rank
    across the corpus (real stopword skew), and each doc draws from
    at most `burst` distinct positions (real documents REUSE their
    own words — an IID-zipf doc of 2000 tokens is ~71% distinct,
    which no natural text is; burst=700 lands near the measured
    Heaps-law ~30-35% distinct of web documents). Pure expression,
    no RNG, repartitioned so generation parallelizes."""
    from pyspark.sql import functions as F

    return (
        spark.range(n_docs)
        .repartition(64)
        .select(
            F.col("id").cast("string").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(doc_len)),
                    lambda i: F.concat(
                        F.lit("t"),
                        F.floor(
                            F.pow(
                                F.lit(float(vocab)),
                                F.pmod(
                                    F.xxhash64(
                                        F.col("id"),
                                        F.pmod(i, F.lit(burst)),
                                    ),
                                    F.lit(1_000_003),
                                )
                                / F.lit(1_000_003.0),
                            )
                        ).cast("string"),
                    ),
                ),
                " ",
            ).alias("text"),
        )
    )


def variant_bigram_occ_join(documents):
    """The round-5 bigram shape: raw bigram occurrences join both
    frequency tables on content."""
    from pyspark.sql import functions as F
    from sparkpdf.operators.text import _tokens

    toksed = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        _tokens("text").alias("toks"),
    )
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 2),
        lambda i: F.struct(
            F.element_at("toks", i + 1).alias("w1"),
            F.element_at("toks", i + 2).alias("w2"),
        ),
    )
    pairs = toksed.filter(F.size("toks") >= 2).select(
        "doc_id", F.explode(bigrams).alias("bg")
    ).select("doc_id", F.col("bg.w1").alias("w1"),
             F.col("bg.w2").alias("w2"))
    big_freq = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    uni_freq = big_freq.groupBy("w1").agg(F.sum("c2").alias("c1"))
    micro = F.round(
        -F.log10(F.col("c2") / F.col("c1")) * 1e6
    ).cast("long")
    return (
        pairs.join(big_freq, ["w1", "w2"])
        .join(uni_freq, "w1")
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(micro) / (F.count("*") * F.lit(1e6)), 6)
            .alias("surprisal"),
            F.count("*").alias("n_bigrams"),
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=None,
                    help="measure a parquet corpus instead of synth")
    ap.add_argument("--docs", type=int, default=10000)
    ap.add_argument("--doc-len", type=int, default=2000)
    ap.add_argument("--vocab", type=int, default=1_000_000)
    ap.add_argument("--burst", type=int, default=700)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--split-budget", type=int, default=1000)
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from sparkpdf.operators.text import token_rarity_score

    spark = get_ui_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # IMPORTANT: read the corpus from PARQUET, never .cache() it —
    # an InMemoryRelation input defeats AQE exchange reuse in this
    # Spark version (measured: the (doc_id, tok) exchange was written
    # 4x and the freq exchange 3x on a cached input, tripling the
    # head_tail shuffle volume), and parquet is what a real corpus is.
    if args.sf:
        docs = spark.read.parquet(
            os.path.join(args.sf, "documents.parquet")
        ).select("doc_id", "text")
    else:
        import shutil
        import tempfile

        tmp = tempfile.mkdtemp(prefix="token_shuffle_bench_")
        import atexit

        atexit.register(shutil.rmtree, tmp, ignore_errors=True)
        _synth_zipf(spark, args.docs, args.doc_len, args.vocab,
                    args.burst).write.mode("overwrite").parquet(tmp)
        docs = spark.read.parquet(tmp)
    n_docs = docs.count()
    from sparkpdf.operators.text import _tokens

    n_tokens = docs.agg(F.sum(F.size(_tokens("text")))).collect()[0][0]
    n_pairs = (
        _toks(docs).dropDuplicates(["doc_id", "tok"]).count()
    )
    result = {"corpus": args.sf or
              f"zipf synth {args.docs}x{args.doc_len} V={args.vocab} "
              f"burst={args.burst}",
              "docs": n_docs, "tokens": int(n_tokens),
              "distinct_pair_ratio": round(n_pairs / max(n_tokens, 1), 3),
              "variants": {}}
    from sparkpdf.operators.text import bigram_surprisal

    variants = [
        ("occ_join", lambda d: variant_occ_join(d), True, "tok"),
        ("tf_join", lambda d: variant_tf_join(d), True, "tok"),
        # default budget: threshold = total // 1e6 — on the synth
        # corpus this is already a real head/tail split
        ("head_tail_default", lambda d: token_rarity_score(d), False,
         "tok"),
        # small head budget: more vocabulary falls to the tail join —
        # the worst case for the pruned shape
        ("head_tail_small_head",
         lambda d: token_rarity_score(d, head_budget=args.split_budget),
         False, "tok"),
        # the same before/after pair for the bigram operator (its own
        # output contract: rows compare within the bigram group)
        ("bigram_occ_join", lambda d: variant_bigram_occ_join(d), True,
         "bigram"),
        ("bigram_head_tail",
         lambda d: bigram_surprisal(d, shape="head_tail"), False,
         "bigram"),
    ]
    baselines = {}
    for name, fn, no_broadcast, group in variants:
        # legacy shapes: disable auto-broadcast so the content-keyed
        # join actually shuffles (the at-scale regime); head_tail uses
        # explicit broadcast() which ignores the threshold
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold",
            "-1" if no_broadcast else str(10 * 1024 * 1024),
        )
        t_start_ms = int(time.time() * 1000)
        t0 = time.time()
        rows = sorted(tuple(r) for r in fn(docs).collect())
        wall = time.time() - t0
        if group not in baselines:
            baselines[group] = rows
        assert rows == baselines[group], f"{name} output differs"
        rec = {"wall_sec": round(wall, 1), "n_docs_out": len(rows)}
        rec.update(_stage_totals(spark, t_start_ms))
        rec["shuffle_write_bytes_per_token"] = round(
            rec["shuffle_write_mb"] * 1e6 / max(int(n_tokens), 1), 1
        )
        rec.update(stage_task_quantiles(spark, t_start_ms))
        result["variants"][name] = rec
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
