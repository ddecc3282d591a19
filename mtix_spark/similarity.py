"""Similarity search over an embedding column (array<float>).

Two paths, mirroring the index module's design:

- `knn_cosine_brute` — exact top-k, pure Column math. The query side is tiny
  (broadcast); per (query, candidate) pair the dot product runs through
  `F.aggregate` in *index order* so the double-precision sum is bit-identical
  to the SQL oracle's ordered sum (float sums are non-associative; fixing the
  order is what makes the value-hash comparison meaningful).
- `knn_cosine_lsh` — the scale path: random-hyperplane (sign) LSH buckets
  candidates; only same-bucket (+ multi-probe neighbor buckets) pairs are
  scored. Approximate — no SQL oracle; recall is asserted in tests against
  the brute-force path.

At 100 TB the brute path is a broadcast-nested-loop over all rows (linear
scan, embarrassingly parallel, no shuffle); the LSH path reduces scored pairs
by ~bucket_count× at some recall cost. An IVF variant would swap the random
hyperplanes for k-means centroids; hyperplanes keep the pipeline
deterministic without a training pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DIM = 64  # embeddings.parquet vector width


def _dot(a: Column, b: Column) -> Column:
    """Ordered double-precision dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_cosine_brute(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_filter=None,
) -> DataFrame:
    """Exact cosine top-k neighbors for the given query ids (self excluded).

    Plan: tiny query relation broadcast against the full embedding table
    (no shuffle on the big side), then per-query top-k via window rank —
    at scale Spark executes the final step as TakeOrderedAndProject per
    query partition. Returns (query_id, rank, vec_id, cosine) with the
    fixed tie-break (cosine DESC, vec_id ASC); cosine rounded to 6.

    `corpus_filter` (optional Column predicate) is the ES filtered-kNN
    contract: it restricts the CANDIDATE side before scoring — filter
    THEN top-k, never a post-filter of an unfiltered top-k — and being a
    plain predicate on the corpus scan it pushes down to parquet. Query
    vectors are still fetched from the unfiltered table (a query need not
    satisfy its own filter)."""
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    corpus = embeddings if corpus_filter is None else embeddings.filter(corpus_filter)
    pairs = corpus.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col(id_col),
        F.round(cosine(F.col("qvec"), F.col(vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "cosine")
    )


def _hyperplanes(n_tables: int, n_planes: int, dim: int = DIM):
    """Deterministic hyperplanes, one (n_planes × dim) set per table."""
    rng = np.random.default_rng(12345)
    return rng.standard_normal((n_tables, n_planes, dim))


def lsh_buckets_udf(n_tables: int, n_planes: int, dim: int = DIM):
    """Vectorized bucket assignment: one Arrow batch → one numpy matmul
    (batch × dim) @ (dim × tables·planes) → sign bits → packed bucket per
    table. Returns a pandas_udf producing array<long> of length n_tables.
    This is the at-scale kernel — no per-row Python, no per-plane pass."""
    from pyspark.sql.functions import pandas_udf

    H = _hyperplanes(n_tables, n_planes, dim)  # (T, P, D)
    W = H.reshape(n_tables * n_planes, dim).T  # (D, T*P)
    weights = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))

    @pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy())  # (B, D) float32
        bits = (M.astype(np.float64) @ W) > 0  # (B, T*P)
        bits = bits.reshape(len(M), n_tables, n_planes)
        ids = (bits.astype(np.uint64) * weights).sum(axis=2).astype(np.int64)
        return pd.Series(list(ids))

    return buckets


def _probe_masks(n_planes: int, radius: int) -> list[int]:
    """All XOR masks of Hamming weight ≤ radius over n_planes sign bits.

    Multi-probe LSH (Lv et al., VLDB'07): besides its own bucket, a query
    probes every bucket within Hamming distance `radius` of it — fan-out
    Σ_{i≤r} C(P,i) buckets per (query, table) in exchange for recall. At
    radius == n_planes every bucket is probed, candidates == corpus, and
    the result MUST equal the brute path exactly (the recall→1 limit) —
    that full-radius mode is what the driver's value-hash oracle checks;
    production configs run radius 0–2.
    """
    from itertools import combinations

    if not 0 <= radius <= n_planes:
        raise ValueError(f"radius must be in [0, {n_planes}], got {radius}")
    masks = [0]
    for r in range(1, radius + 1):
        for bits in combinations(range(n_planes), r):
            masks.append(sum(1 << b for b in bits))
    return masks


def _probe_expand(tabbed: DataFrame, n_planes: int, radius: int) -> DataFrame:
    """Explode each (table, bucket) row into its probed bucket neighborhood
    (bucket XOR mask for every mask of weight ≤ radius). The mask list is a
    driver-side constant — C(P,≤r) literals — so the expansion is one
    generator, no join, no Python on the executor path."""
    if radius <= 0:
        return tabbed
    masks = _probe_masks(n_planes, radius)
    return tabbed.withColumn(
        "bucket",
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(int(m))) for m in masks])
        ),
    )


def knn_cosine_lsh(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_tables: int = 8,
    n_planes: int = 6,
    multiprobe_radius: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH.

    Each row lands in one bucket per table; a pair is a candidate if it
    collides in ANY table (recall ≈ 1-(1-p^P)^T for bit-agreement prob p).
    Candidate generation is an equi-join on (table, bucket) — shuffle keyed
    by bucket, never O(n²). Same output contract as the brute path; recall
    is data-dependent and asserted in tests on clustered data.

    `multiprobe_radius` > 0 additionally probes each query's neighbor
    buckets within that Hamming distance (`_probe_masks`) — the probe
    explosion happens on the TINY broadcast query side only, the corpus
    side is hashed once. radius == n_planes is the exact mode (probes
    everything; rank-identical to `knn_cosine_brute`, which is what the
    value-hash oracle asserts).

    Sizing: 2^n_planes is the bucket count per table — pick
    n_planes ≈ log2(n_rows / target_bucket_size) so buckets hold tens-to-
    hundreds of candidates (default 6 suits 10³–10⁴ rows; a 10¹² corpus
    wants ~26–30 planes and more tables).
    """
    udf = lsh_buckets_udf(n_tables, n_planes)
    emb = embeddings.withColumn("bk", udf(F.col(vec_col)))
    tabbed = emb.select(
        id_col,
        vec_col,
        F.posexplode("bk").alias("table", "bucket"),
    )
    q = tabbed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        "table",
        "bucket",
    )
    q = _probe_expand(q, n_planes, multiprobe_radius)
    pairs = tabbed.join(F.broadcast(q), ["table", "bucket"]).filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = (
        pairs.select("query_id", id_col, "qvec", vec_col)
        .dropDuplicates(["query_id", id_col])
        .select(
            "query_id",
            F.col(id_col),
            F.round(cosine(F.col("qvec"), F.col(vec_col)), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "cosine")
    )


def embedding_near_dup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_tables: int = 8,
    n_planes: int = 6,
    multiprobe_radius: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs at scale: sign-LSH candidate
    generation → exact cosine only on colliding pairs.

    Every row lands in one bucket per table (`lsh_buckets_udf`, one matmul
    per Arrow batch); candidates are the same-bucket pairs of each table —
    an equi-join on (table, bucket), shuffle keyed by bucket, never O(n²).
    Distinct candidate pairs then join the embedding table twice (shuffles
    keyed by id) for the exact ordered-sum cosine, so precision is exact;
    recall is the LSH collision probability (≈1−(1−p^P)^T, asserted ≥0.9 on
    clustered data in tests). Returns (id_a, id_b, cosine ≥ threshold),
    cosine rounded to 6. The all-pairs twin below is the small-scale oracle.
    """
    udf = lsh_buckets_udf(n_tables, n_planes)
    tabbed = embeddings.select(
        id_col, F.posexplode(udf(F.col(vec_col))).alias("table", "bucket")
    )
    # multi-probe on ONE side only: XOR distance is symmetric, so probing
    # a's radius-r neighborhood reaches every pair within Hamming r — at
    # radius == n_planes the candidate set is all pairs and the output is
    # value-identical to the all-pairs twin below (the oracle mode)
    a = _probe_expand(tabbed, n_planes, multiprobe_radius).alias("a")
    b = tabbed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    va = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine ≥ threshold).

    Exact all-pairs — O(n²) scored pairs: this is the small-scale ORACLE
    TWIN for `embedding_near_dup_pairs_lsh` above (which is the at-scale
    entry: LSH candidates, no cartesian anywhere in its plan). Cosine
    rounded to 6 before thresholding (oracle-stable).
    """
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — k-means coarse quantizer + cluster-probe search
# ---------------------------------------------------------------------------


def _ivf_assign_udf(centroids: np.ndarray):
    """Vectorized nearest-centroid assignment (spherical / cosine): one
    Arrow batch → one (batch × dim) @ (dim × C) matmul → argmax. The
    centroid matrix rides a closure broadcast — C × dim doubles, tiny."""
    from pyspark.sql.functions import pandas_udf

    Cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    W = Cn.T  # (D, C)

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy()).astype(np.float64)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
        return pd.Series((M @ W).argmax(axis=1).astype(np.int32))

    return assign


def ivf_fit(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_rows: int | None = 200_000,
    salt: str = "ivf",
) -> np.ndarray:
    """Train the IVF coarse quantizer: spherical k-means with deterministic
    init (the vectors of the n_centroids smallest ids — no RNG, so reruns
    over the same table converge identically up to float-sum order; per-
    iteration centroid sums are rounded to 9 dp to absorb shuffle-order
    ULP noise). Each Lloyd iteration is one assignment pass (Arrow matmul
    kernel) + one (cluster, dim) mean aggregation — rows never collect;
    only the C × D centroid matrix does.

    At 10¹² rows k-means must not scan the full table per Lloyd iteration:
    when the table exceeds `train_rows`, training runs over a deterministic
    ~train_rows-row subset picked by content-stable hash on `id_col`
    (sampling.hash_bucket — partitioning-independent, pushed into the
    scan), full scan at or below it. Same table + same salt → same sample
    → same centroids, on any cluster size. `train_rows=None` forces
    full-table training. Queries/assignment always cover the FULL table;
    only quantizer training samples."""
    train = embeddings
    if train_rows is not None:
        n_total = embeddings.count()
        if n_total > train_rows:
            from mtix_spark.sampling import hash_sample

            train = hash_sample(
                embeddings, train_rows / n_total, id_col, salt=salt
            )
    init = (
        train.orderBy(id_col)
        .limit(n_centroids)
        .select(vec_col)
        .collect()
    )
    C = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in init])
    for _ in range(iters):
        assign = _ivf_assign_udf(C)
        sums = (
            train.select(assign(F.col(vec_col)).alias("cl"), vec_col)
            .select("cl", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("cl", "pos")
            .agg(
                F.round(F.sum(F.col("val").cast("double")), 9).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        newC = C.copy()
        by_cl: dict = {}
        for r in sums:
            by_cl.setdefault(int(r["cl"]), []).append(r)
        for cl, rows in by_cl.items():
            vec = np.zeros(C.shape[1])
            for r in rows:
                vec[int(r["pos"])] = float(r["s"]) / float(r["n"])
            if np.linalg.norm(vec) > 0:
                newC[cl] = vec
        C = newC
    return C


def knn_cosine_ivf(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_rows: int | None = 200_000,
) -> DataFrame:
    """Approximate top-k via an IVF index: k-means centroids partition the
    corpus into inverted lists; each query probes its `nprobe` nearest
    centroids and scores EXACT cosine only inside those lists.

    The trained-quantizer twin of `knn_cosine_lsh` (SURVEY's "IVF or
    LSH-bucketed variant"): same output contract (query_id, rank, vec_id,
    cosine@6dp, tie-break cosine DESC / vec_id ASC), scores exact on the
    candidate set, recall data-dependent (asserted vs brute in tests).
    Candidate generation is a broadcast equi-join on the cluster id —
    shuffle bounded by probed-list sizes, never O(n²). Past `train_rows`
    rows the quantizer trains on a deterministic hash sample (ivf_fit);
    at 10¹² rows lists additionally shard by (cluster, range)."""
    C = ivf_fit(embeddings, n_centroids, iters, id_col, vec_col, train_rows)
    assign = _ivf_assign_udf(C)
    assigned = embeddings.select(
        id_col, vec_col, assign(F.col(vec_col)).alias("cl")
    )

    qrows = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        id_col, vec_col
    ).collect()  # bounded: the query set
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    probes = []
    for r in qrows:
        v = np.asarray(r[vec_col], dtype=np.float64)
        v /= max(np.linalg.norm(v), 1e-30)
        top = np.argsort(-(Cn @ v), kind="stable")[:nprobe]
        probes.extend((int(r[id_col]), int(c)) for c in top)
    spark = embeddings.sparkSession
    probe_df = spark.createDataFrame(probes, "query_id long, cl int")
    qvecs = spark.createDataFrame(
        [(int(r[id_col]), list(map(float, r[vec_col]))) for r in qrows],
        f"query_id long, qvec array<double>",
    )

    cand = assigned.join(F.broadcast(probe_df), "cl").filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = (
        cand.dropDuplicates(["query_id", id_col])
        .join(F.broadcast(qvecs), "query_id")
        .select(
            "query_id",
            F.col(id_col),
            F.round(cosine(F.col("qvec"), F.col(vec_col)), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "cosine")
    )
