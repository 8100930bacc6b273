"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline; the LSH-bucketed
variant is the 100 TB path (random-hyperplane signs computed from
deterministic per-dimension weights so the oracle can reproduce them).
Dot products run JVM-side via zip_with/aggregate — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_unit_vectors(embeddings: DataFrame) -> DataFrame:
    """Cast to double and L2-normalise once, upfront — cosine becomes a
    plain dot product downstream (compute-once at 100 TB). The norm is
    a materialized column, NOT an expression captured in the division
    lambda: CollapseProject would re-inline it per ELEMENT (an O(dim)
    aggregate per component = O(dim^2) per row — the round-5
    lambda-capture trap)."""
    vec = F.transform("embedding", lambda v: v.cast("double"))
    # the norm rides in as a zip_with ARGUMENT (argument expressions
    # evaluate once per row; only lambda-body captures re-evaluate per
    # element), broadcast across the row via array_repeat — O(dim) per
    # row, and x / n keeps float results bit-identical to the oracle
    # (x * (1/n) would differ by an ulp)
    norms = F.array_repeat(_norm(vec), F.size(vec))
    return embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.zip_with(vec, norms, lambda x, nn: x / nn).alias("unit"),
    )


def brute_force_topk(
    embeddings: DataFrame, n_queries: int = 8, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbours for the first `n_queries` vectors.

    Plan shape: broadcast the tiny query side against the full corpus
    (the only scalable orientation), dot products in codegen, then a
    per-query top-k via window rank — the shuffle is on n_queries keys
    only. Output is rank-only (no floats) so the oracle hash is stable."""
    unit = with_unit_vectors(embeddings)
    queries = unit.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("unit").alias("qunit")
    )
    scored = F.broadcast(queries).crossJoin(unit.alias("corpus")).filter(
        F.col("query_id") != F.col("vec_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        _dot(F.col("qunit"), F.col("unit")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def lsh_bucket_topk(
    embeddings: DataFrame, n_planes: int = 4, n_queries: int = 8, k: int = 3,
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH: sign bits of dot(v, plane_j) form a bucket
    key; neighbours are searched within the query's bucket only.

    plane_j[d] = ((1103515245 * (j * 1024 + d) + 12345) % 2001 - 1000)
    / 1000 — a fixed LCG, reproducible in ANSI SQL for the oracle. At
    100 TB this turns the cross join into a bucket-equi-join whose fan-in
    we control with n_planes."""
    unit = with_unit_vectors(embeddings)

    def plane_weight(j, d):
        return ((1103515245 * (j * 1024 + d) + 12345) % 2001 - 1000) / 1000.0

    def bucket_bit(j):
        proj = F.aggregate(
            F.zip_with(
                "unit",
                F.array(*[F.lit(plane_weight(j, d)) for d in range(dim)]),
                lambda v, w: v * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0))

    bucketed = unit.withColumn(
        "bucket",
        sum([bucket_bit(j) for j in range(n_planes)], F.lit(0)).cast("int"),
    )
    queries = bucketed.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("unit").alias("qunit"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        F.broadcast(queries)
        .join(bucketed, F.col("qbucket") == F.col("bucket"))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _dot(F.col("qunit"), F.col("unit")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _plane_weight(j, d):
    # fixed LCG, reproducible in ANSI SQL for the oracle
    return ((1103515245 * (j * 1024 + d) + 12345) % 2001 - 1000) / 1000.0


def banded_lsh_buckets(
    embeddings: DataFrame, n_bands: int, n_planes: int, dim: int = 64
) -> DataFrame:
    """Multi-band random-hyperplane LSH: band b hashes with its OWN
    n_planes hyperplanes (global plane index b*n_planes+j), giving
    n_bands independent bucket tables stacked as (band_no, bucket).
    Banding trades replication (x n_bands rows) for recall exactly like
    MinHash-LSH: P(candidate) = 1 - (1 - p^n_planes)^n_bands with
    p = 1 - theta/pi."""
    unit = with_unit_vectors(embeddings)

    def bucket_bit(g, j):
        proj = F.aggregate(
            F.zip_with(
                "unit",
                F.array(*[F.lit(_plane_weight(g, d)) for d in range(dim)]),
                lambda v, w: v * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0))

    bands = [
        sum(
            [bucket_bit(b * n_planes + j, j) for j in range(n_planes)],
            F.lit(0),
        ).cast("int").alias(f"bucket{b}")
        for b in range(n_bands)
    ]
    all_bands = unit.select("vec_id", "unit", *bands)
    # posexplode fans the bands out map-side from ONE hyperplane
    # computation (a union of per-band selects recomputes all
    # n_bands * n_planes projections per branch)
    return all_bands.select(
        "vec_id",
        "unit",
        F.posexplode(
            F.array(*[F.col(f"bucket{b}") for b in range(n_bands)])
        ).alias("band_no", "bucket"),
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.44,
    n_bands: int = 8,
    n_planes: int = 8,
    dim: int = 64,
    bucket_cap: int = 10000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: banded LSH candidates,
    exact cosine verify inside each (band_no, bucket), distinct across
    bands.

    Scale design (vs the round-1 single 16-bucket table):
      * n_bands independent plane sets x 2^n_planes buckets each — the
        within-bucket self-join is all-pairs/2^n_planes per band, and
        n_planes (selectivity) tunes independently of recall (n_bands).
      * bucket_cap: any (band_no, bucket) with more than `bucket_cap`
        members is excluded from the self-join (skew/degenerate-vector
        guard); use near_dup_overflow() to account for what was skipped.
        The cap bounds the worst bucket's join at cap^2 rows.
      * recall = 1-(1-p^n_planes)^n_bands, p = 1-theta/pi: the defaults
        give ~0.99 at cosine 0.95, ~0.85 at 0.85, but only ~0.22 at the
        0.44 threshold the oracle query uses (63-degree angles are not
        LSH-friendly; measured numbers in BENCH/BASELINE.md). For a
        production near-dup sweep at cosine>=0.9 use n_planes=16,
        n_bands=24 (recall ~0.88, buckets of N/65536)."""
    stacked = banded_lsh_buckets(embeddings, n_bands, n_planes, dim)
    counts = stacked.groupBy("band_no", "bucket").agg(
        F.count("*").alias("bucket_n")
    )
    capped = stacked.join(
        F.broadcast(counts.filter(F.col("bucket_n") <= bucket_cap)),
        ["band_no", "bucket"],
    )
    a, b = capped.alias("a"), capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(_dot(F.col("a.unit"), F.col("b.unit")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )


def near_dup_overflow(
    embeddings: DataFrame,
    n_bands: int = 8,
    n_planes: int = 8,
    dim: int = 64,
    bucket_cap: int = 10000,
) -> DataFrame:
    """Overflow accounting for embedding_near_dups: the (band_no,
    bucket, bucket_n) rows whose buckets exceeded bucket_cap and were
    skipped — at 100 TB these go to a quarantine sweep (sample-verify or
    a higher-planes re-hash), never silently dropped."""
    stacked = banded_lsh_buckets(embeddings, n_bands, n_planes, dim)
    return (
        stacked.groupBy("band_no", "bucket")
        .agg(F.count("*").alias("bucket_n"))
        .filter(F.col("bucket_n") > bucket_cap)
    )


def ivf_assignments(embeddings: DataFrame, n_lists: int = 8) -> DataFrame:
    """IVF coarse quantizer: the first n_lists unit vectors act as the
    (deterministic) centroid codebook — a seeded k-means stand-in so
    the oracle can replay it — and every vector joins its nearest
    centroid's inverted list. Assignment = broadcast centroids ->
    per-pair cosine -> rank-1 by (sim desc, centroid_id asc)."""
    from pyspark.sql import Window

    unit = with_unit_vectors(embeddings)
    centroids = unit.filter(F.col("vec_id") < n_lists).select(
        F.col("vec_id").alias("centroid_id"), F.col("unit").alias("cunit")
    )
    scored = unit.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "unit",
        "centroid_id",
        _dot(F.col("unit"), F.col("cunit")).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "unit", "centroid_id")
    )


def _assign_to_centroids(unit: DataFrame, cents: DataFrame) -> DataFrame:
    """vec -> nearest centroid by cosine (rounded 6dp for engine-stable
    ranking), rank-1 by (sim desc, centroid_id asc)."""
    scored = unit.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "unit",
        "centroid_id",
        F.round(_dot(F.col("unit"), F.col("cunit")), 6).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "unit", "centroid_id")
    )


def kmeans_ivf_assignments(
    embeddings: DataFrame, n_lists: int = 8, n_iters: int = 2
) -> DataFrame:
    """IVF coarse quantizer with REAL Lloyd iterations (replaces the
    round-1 first-N stand-in): seed = first n_lists unit vectors, then
    n_iters rounds of (assign by cosine -> per-dimension mean ->
    L2-normalize). Deterministic and oracle-replayable: every float
    product (assignment sims, means, normalized centroids) is rounded
    to 6dp so Spark's partial-agg summation order and DuckDB's agree.

    Scale shape: centroids are a tiny broadcast table; each iteration
    costs one posexplode shuffle on (centroid_id, dim) — cardinality
    n_lists*dim, trivially small — plus the broadcast assignment pass.
    The classic distributed k-means plan."""
    unit = with_unit_vectors(embeddings)
    cents = _kmeans_centroids(unit, n_lists, n_iters)
    return _assign_to_centroids(unit, cents)


def _kmeans_centroids(
    unit: DataFrame, n_lists: int, n_iters: int
) -> DataFrame:
    """The Lloyd loop of kmeans_ivf_assignments, returning the FINAL
    centroid table (centroid_id, cunit) — exposed so the residual
    IVFPQ path can subtract the coarse centroid each vector was
    assigned against (the assignment uses exactly these centroids)."""
    cents = unit.filter(F.col("vec_id") < n_lists).select(
        F.col("vec_id").alias("centroid_id"), F.col("unit").alias("cunit")
    )
    for _ in range(n_iters):
        assigned = _assign_to_centroids(unit, cents)
        means = (
            assigned.select(
                "centroid_id", F.posexplode("unit").alias("dim", "val")
            )
            .groupBy("centroid_id", "dim")
            .agg(F.round(F.avg("val"), 6).alias("m"))
        )
        packed = (
            means.groupBy("centroid_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("a")
            )
            .select(
                "centroid_id",
                F.transform("a", lambda s: s["m"]).alias("cvec"),
            )
        )
        cents = packed.select(
            "centroid_id",
            F.transform(
                F.transform("cvec", lambda v: v / _norm(F.col("cvec"))),
                lambda v: F.round(v, 6),
            ).alias("cunit"),
        )
    return cents


def ivf_kmeans_topk(
    embeddings: DataFrame,
    n_lists: int = 8,
    n_iters: int = 2,
    n_queries: int = 4,
    k: int = 3,
) -> DataFrame:
    """IVF search (nprobe=1) over the k-means codebook: same inverted-
    list join shape as ivf_topk, real centroids."""
    assigned = kmeans_ivf_assignments(embeddings, n_lists, n_iters)
    queries = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("unit").alias("qunit"),
        F.col("centroid_id").alias("qlist"),
    )
    scored = (
        F.broadcast(queries)
        .join(assigned, F.col("qlist") == F.col("centroid_id"))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_dot(F.col("qunit"), F.col("unit")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_topk(
    embeddings: DataFrame,
    n_lists: int = 8,
    n_queries: int = 4,
    k: int = 3,
    nprobe: int = 1,
) -> DataFrame:
    """IVF search: each query scans its `nprobe` nearest inverted
    lists — the join is on centroid_id, so at 100 TB the fan-in per
    query is nprobe * corpus/n_lists instead of the whole corpus
    (nprobe tunes the recall/cost knob exactly as in FAISS-style IVF)."""
    from pyspark.sql import Window

    assigned = ivf_assignments(embeddings, n_lists)
    unit = with_unit_vectors(embeddings)
    centroids = unit.filter(F.col("vec_id") < n_lists).select(
        F.col("vec_id").alias("centroid_id"), F.col("unit").alias("cunit")
    )
    qw = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("centroid_id").asc()
    )
    queries = (
        unit.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), F.col("unit").alias("qunit"))
        .crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "qunit",
            "centroid_id",
            _dot(F.col("qunit"), F.col("cunit")).alias("csim"),
        )
        .withColumn("crk", F.row_number().over(qw))
        .filter(F.col("crk") <= nprobe)
        .select("query_id", "qunit", F.col("centroid_id").alias("qlist"))
    )
    scored = (
        F.broadcast(queries)
        .join(assigned, F.col("qlist") == F.col("centroid_id"))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _dot(F.col("qunit"), F.col("unit")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def pq_codes(
    embeddings: DataFrame,
    m_sub: int = 4,
    n_centroids: int = 8,
    n_iters: int = 2,
    dim: int = 64,
) -> "tuple[DataFrame, DataFrame]":
    """Product quantization (the memory-at-scale ANN compressor):
    split each unit vector into m_sub subspaces, train an independent
    codebook per subspace (seed = first n_centroids subvectors, then
    n_iters Lloyd rounds: assign by dot, update by per-dim mean — the
    kmeans_ivf discipline, every float rounded 6dp so Spark and the
    oracle agree), and encode the corpus as m_sub small centroid ids
    per vector. Returns (codebooks, codes): codebooks =
    (sub_id, centroid_id, cvec) — tiny, broadcastable (m*k*dim/m
    doubles); codes = (vec_id, sub_id, centroid_id) — the 64-dim
    float vector compressed to m_sub bytes at 10^12 scale.

    Scale shape: training assignment is a broadcast join + one
    (vec, sub)-keyed window; the centroid update is a partial-agg
    groupBy of cardinality m*k*subdim. The corpus never self-joins."""
    sub_len = dim // m_sub
    unit = with_unit_vectors(embeddings)
    subs = _pq_subvectors(unit, "unit", m_sub, sub_len)
    return _pq_train(subs, n_centroids, n_iters)


def _pq_subvectors(vecs: DataFrame, col: str, m_sub: int,
                   sub_len: int) -> DataFrame:
    """(vec_id, <col>) -> (vec_id, sub_id, sub): each vector split
    into m_sub contiguous subspaces."""
    return vecs.select(
        "vec_id",
        F.posexplode(
            F.array(*[
                F.slice(col, s * sub_len + 1, sub_len)
                for s in range(m_sub)
            ])
        ).alias("sub_id", "sub"),
    )


def _pq_assign(subs: DataFrame, cbooks: DataFrame) -> DataFrame:
    """Nearest codeword per (vec, sub) by rounded dot, rank-1 ties to
    the lowest centroid_id — the shared PQ assignment step.

    Known tradeoff (r8 advice, documented): assignment maximizes the
    dot product while ivfpq_residual_topk scores with L2 ADC, and
    residual subvectors are not unit-normalized — standard IVFADC
    assigns by min L2, so on corpora whose subvector NORMS vary widely
    this encoding can lose recall vs the textbook assignment. It is
    deterministic, oracle-replayable, and recall@3 = 1.0 on the
    clustered corpus; switching metrics would change every PQ code and
    therefore every PQ oracle, so it stays dot-assigned until a round
    that re-baselines those oracles."""
    scored = subs.join(F.broadcast(cbooks), "sub_id").select(
        "vec_id", "sub_id", "sub", "centroid_id",
        F.round(_dot(F.col("sub"), F.col("cvec")), 6).alias("sim"),
    )
    w = Window.partitionBy("vec_id", "sub_id").orderBy(
        F.col("sim").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "sub_id", "sub", "centroid_id")
    )


def _pq_train(subs: DataFrame, n_centroids: int,
              n_iters: int) -> "tuple[DataFrame, DataFrame]":
    """Lloyd-train per-subspace codebooks over an arbitrary
    (vec_id, sub_id, sub) frame (unit subvectors for flat PQ,
    residual subvectors for IVFADC) and encode it. Seeds = the first
    n_centroids vectors' subvectors; every float rounded 6dp."""
    cents = subs.filter(F.col("vec_id") < n_centroids).select(
        "sub_id",
        F.col("vec_id").alias("centroid_id"),
        F.col("sub").alias("cvec"),
    )
    for _ in range(n_iters):
        assigned = _pq_assign(subs, cents)
        means = (
            assigned.select(
                "sub_id", "centroid_id",
                F.posexplode("sub").alias("dim", "val"),
            )
            .groupBy("sub_id", "centroid_id", "dim")
            .agg(F.round(F.avg("val"), 6).alias("m"))
        )
        cents = (
            means.groupBy("sub_id", "centroid_id")
            .agg(F.array_sort(
                F.collect_list(F.struct("dim", "m"))).alias("a"))
            .select(
                "sub_id", "centroid_id",
                F.transform("a", lambda s: s["m"]).alias("cvec"),
            )
        )
    codes = _pq_assign(subs, cents).select(
        "vec_id", "sub_id", "centroid_id")
    return cents, codes


def pq_topk(
    embeddings: DataFrame,
    m_sub: int = 4,
    n_centroids: int = 8,
    n_iters: int = 2,
    n_queries: int = 4,
    k: int = 3,
    dim: int = 64,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query, dot
    each EXACT query subvector against every codebook entry (a tiny
    q x m x k table, broadcast), then score each corpus vector as the
    FIXED-ORDER sum of its m_sub table lookups — addition order is
    pinned (sub 0..m-1) so Spark's aggregation and DuckDB's agree
    bit-for-bit, the same determinism discipline as the kmeans
    rounding. Rank by (score desc, neighbor asc), self excluded.

    Scale shape: the corpus side touches only its codes (m_sub ints
    per vector — the point of PQ at 100 TB); the lookup join is
    broadcast; the per-(query, vector) reduce is a partial-agg
    groupBy. Exact subvectors never leave the codebook training."""
    cents, codes = pq_codes(embeddings, m_sub, n_centroids,
                            n_iters, dim)
    sub_len = dim // m_sub
    unit = with_unit_vectors(embeddings)
    qsubs = unit.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.posexplode(
            F.array(*[
                F.slice("unit", s * sub_len + 1, sub_len)
                for s in range(m_sub)
            ])
        ).alias("sub_id", "qsub"),
    )
    tab = qsubs.join(F.broadcast(cents), "sub_id").select(
        "query_id", "sub_id", "centroid_id",
        F.round(_dot(F.col("qsub"), F.col("cvec")), 6).alias("part"),
    )
    parts = codes.join(
        F.broadcast(tab), ["sub_id", "centroid_id"]
    ).filter(F.col("query_id") != F.col("vec_id"))
    # fixed-order reduction: one conditional agg per subspace, added
    # 0..m-1 — never a SUM whose accumulation order the engine picks
    per_sub = [
        F.first(F.when(F.col("sub_id") == s, F.col("part")),
                ignorenulls=True).alias(f"p{s}")
        for s in range(m_sub)
    ]
    scored = parts.groupBy("query_id", "vec_id").agg(*per_sub)
    score = F.col("p0")
    for s in range(1, m_sub):
        score = score + F.col(f"p{s}")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(score, 6).alias("score"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def synthesize_clustered_embeddings(
    embeddings: DataFrame, dim: int = 64
) -> DataFrame:
    """Deterministic CLUSTERED embedding corpus (round 8) — the
    realistic-data counterpart of the iid-random embeddings table,
    where ANN recall is meaningful (iid vectors are PQ's adversarial
    worst case, pq_recall ~= 0.25 by design). Integer-valued so both
    engines compute bit-identical doubles:

      emb[j] = 10*center(c,j) + 2*pat(t,j) + micro(v,j)
        c      = v % 8                      (cluster; vec 0..7 seed
                                             one k-means centroid per
                                             cluster)
        k      = v // 32                    (duplicate-group block)
        digit  = k%8 for subspaces 0,2;
                 (k//8 + 2*(k%4)) % 8 for subspaces 1,3
                 ((digit0, digit1) identifies k for k < 64, i.e. all
                 test scales, so duplicate groups never merge; BOTH
                 digits take every value 0..7 uniformly over k, so
                 every subspace carries pattern signal in every
                 cluster — a dead or cluster-skewed subspace would
                 train its codebook on jitter/cluster offsets and
                 corrupt the ADC sum)
        t      = (digit + c) % 8            (+c so vecs 0..7 also seed
                                             all 8 PQ patterns per
                                             subspace)
        center = ((c*37 + j*11) % 19) - 9
        pat    = ((t*23 + j*5) % 9) - 4
        micro  = ((v*13 + j*7) % 3) - 1

    Structure: 8 well-separated centers >> 8 residual patterns per
    subspace >> +-1 jitter; vectors sharing (c, k) — exactly 4 ids
    v = 32k + 8i + c — are near-duplicates, so each query's exact
    top-3 IS its duplicate group, and a residual codebook with 8
    centroids can represent the patterns. Oracle-replayable: the SQL
    states the same closed form."""
    v = F.col("vec_id").cast("long")

    def component(j):
        digit = (
            F.when((j < 16) | ((j >= 32) & (j < 48)),
                   F.shiftright(v, 5) % 8)
            .otherwise(
                (F.shiftright(v, 8) % 8
                 + 2 * (F.shiftright(v, 5) % 4)) % 8)
        )
        t = (digit + v % 8) % 8
        center = ((v % 8) * 37 + j * 11) % 19 - 9
        pat = (t * 23 + j * 5) % 9 - 4
        micro = (v * 13 + j * 7) % 3 - 1
        return (center * 10 + pat * 2 + micro).cast("double")

    return embeddings.select(
        v.alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)).cast("array<long>"),
            component,
        ).alias("embedding"),
    )


def ivfpq_residual_build(
    embeddings: DataFrame,
    n_lists: int = 8,
    n_iters: int = 2,
    m_sub: int = 4,
    n_centroids: int = 8,
    dim: int = 64,
) -> "tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame]":
    """Train the IVFADC index once: coarse k-means, assignments,
    6dp residuals, residual PQ codebooks and codes. Returns
    (assigned, coarse_cents, resid, pq_cents, codes) — the reusable
    index artifacts (ann_job --ivfpq-residual persists assigned /
    pq_cents / codes) and the input ivfpq_residual_topk searches
    with, so a job never trains the quantizer twice."""
    sub_len = dim // m_sub
    unit = with_unit_vectors(embeddings)
    cents = _kmeans_centroids(unit, n_lists, n_iters)
    assigned = _assign_to_centroids(unit, cents)
    resid = assigned.join(F.broadcast(cents), "centroid_id").select(
        "vec_id",
        "centroid_id",
        F.zip_with(
            "unit", "cunit", lambda x, c: F.round(x - c, 6)
        ).alias("rvec"),
    )
    pq_cents, codes = _pq_train(
        _pq_subvectors(resid, "rvec", m_sub, sub_len),
        n_centroids, n_iters,
    )
    return assigned, cents, resid, pq_cents, codes


def ivfpq_residual_topk(
    embeddings: DataFrame,
    n_lists: int = 8,
    n_iters: int = 2,
    m_sub: int = 4,
    n_centroids: int = 8,
    n_queries: int = 4,
    k: int = 3,
    dim: int = 64,
    prebuilt: "tuple | None" = None,
) -> DataFrame:
    """Residual IVFPQ — the standard public IVFADC layout (Jegou,
    Douze, Schmid 2011): PQ codebooks are trained on and encode the
    RESIDUAL unit - coarse_centroid instead of the raw vector, so the
    quantizer's 8 codewords per subspace spend their bits on the
    within-list structure the coarse quantizer didn't explain.

    Metric: L2 ADC. The corpus is unit-normalized, so cosine ranking
    == ascending ||q - v||^2, and within the probed list q - c_L is
    EXACTLY the query's own residual, giving the textbook
    decomposition  ||q - v||^2 = ||r_q - r_v||^2  — approximated per
    subspace as ||r_q_sub - cw(code)||^2 from a broadcast LUT built
    on the QUERY RESIDUAL. This is deliberately not an inner-product
    LUT on the full query: pooled residual codewords carry
    cross-cluster offset components, and a q . cw table multiplies
    them by the (large) centroid direction — measured on the
    clustered corpus that bias is ~7x the pattern signal and
    destroys the ranking, while the L2 form only touches them
    through r_q . cw and the exact ||cw||^2 correction.

    Scale shape is ivfpq_topk's: routing reads list ids, scoring
    reads m_sub ints per candidate plus the broadcast q x m x k LUT;
    full-precision vectors never join the corpus side. Determinism:
    6dp Lloyd rounding, 6dp residuals, fixed-order LUT sums. Returns
    rank by (adc_dist2 asc, neighbor_id asc); score = adc_dist2.

    `prebuilt`: the ivfpq_residual_build artifact tuple — pass it to
    search against a quantizer trained once (ann_job persists the
    index/codebooks/codes from the same build it searches with)."""
    if prebuilt is None:
        prebuilt = ivfpq_residual_build(
            embeddings, n_lists, n_iters, m_sub, n_centroids, dim)
    assigned, _cents, resid, pq_cents, codes = prebuilt
    sub_len = dim // m_sub
    # query residual w.r.t. its own probed list — q - c_L exactly
    queries = resid.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("centroid_id").alias("qlist"),
        F.col("rvec").alias("qres"),
    )
    cand = (
        F.broadcast(queries.select("query_id", "qlist"))
        .join(assigned.select("vec_id", "centroid_id"),
              F.col("qlist") == F.col("centroid_id"))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
    )
    qsubs = _pq_subvectors(
        queries.select(F.col("query_id").alias("vec_id"), "qres"),
        "qres", m_sub, sub_len,
    ).select(
        F.col("vec_id").alias("query_id"), "sub_id",
        F.col("sub").alias("qsub"),
    )
    # LUT entry: ||r_q_sub - cw||^2, rounded 6dp
    tab = qsubs.join(F.broadcast(pq_cents), "sub_id").select(
        "query_id", "sub_id", "centroid_id",
        F.round(
            F.aggregate(
                F.zip_with("qsub", "cvec", lambda x, c: (x - c) * (x - c)),
                F.lit(0.0),
                lambda acc, d: acc + d,
            ),
            6,
        ).alias("part"),
    )
    parts = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(tab), ["query_id", "sub_id", "centroid_id"])
    )
    per_sub = [
        F.first(F.when(F.col("sub_id") == s, F.col("part")),
                ignorenulls=True).alias(f"p{s}")
        for s in range(m_sub)
    ]
    scored = parts.groupBy("query_id", "vec_id").agg(*per_sub)
    score = F.col("p0")
    for s in range(1, m_sub):
        score = score + F.col(f"p{s}")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(score, 6).alias("score"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def ivfpq_topk(
    embeddings: DataFrame,
    n_lists: int = 8,
    n_iters: int = 2,
    m_sub: int = 4,
    n_centroids: int = 8,
    n_queries: int = 4,
    k: int = 3,
    dim: int = 64,
) -> DataFrame:
    """IVF x PQ — the production large-scale ANN composition: the
    coarse k-means quantizer routes each query to its inverted list
    (pruning the corpus to ~1/n_lists, the ivf_kmeans shape), and the
    candidates are scored from their PQ CODES by asymmetric distance
    (the pq_topk shape) — so the search touches neither the full
    corpus nor any full-precision corpus vector: routing reads list
    ids, scoring reads m_sub ints per candidate plus the broadcast
    q x m x k lookup table. nprobe=1 (the ivf_kmeans_topk recall
    posture; the nprobe knob generalizes exactly as in ivf_topk).

    Determinism discipline: coarse centroids and codebooks share the
    6dp Lloyd rounding; ADC scores are fixed-order subspace sums."""
    assigned = kmeans_ivf_assignments(embeddings, n_lists, n_iters)
    cents, codes = pq_codes(embeddings, m_sub, n_centroids,
                            n_iters, dim)
    sub_len = dim // m_sub
    queries = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("unit").alias("qunit"),
        F.col("centroid_id").alias("qlist"),
    )
    # candidate set: the probed list's members (corpus touches only
    # its (vec_id, list) pairs; queries broadcast)
    cand = (
        F.broadcast(queries.select("query_id", "qlist"))
        .join(assigned.select("vec_id", "centroid_id"),
              F.col("qlist") == F.col("centroid_id"))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
    )
    qsubs = queries.select(
        "query_id",
        F.posexplode(
            F.array(*[
                F.slice("qunit", s * sub_len + 1, sub_len)
                for s in range(m_sub)
            ])
        ).alias("sub_id", "qsub"),
    )
    tab = qsubs.join(F.broadcast(cents), "sub_id").select(
        "query_id", "sub_id", "centroid_id",
        F.round(_dot(F.col("qsub"), F.col("cvec")), 6).alias("part"),
    )
    parts = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(tab), ["query_id", "sub_id", "centroid_id"])
    )
    per_sub = [
        F.first(F.when(F.col("sub_id") == s, F.col("part")),
                ignorenulls=True).alias(f"p{s}")
        for s in range(m_sub)
    ]
    scored = parts.groupBy("query_id", "vec_id").agg(*per_sub)
    score = F.col("p0")
    for s in range(1, m_sub):
        score = score + F.col(f"p{s}")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(score, 6).alias("score"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )
