"""Deduplication operators for a large-scale training-data pipeline.

All hot paths are JVM-side Column expressions (whole-stage codegen) — no
Python UDFs. Hash functions are defined over md5 hex prefixes so the exact
same integers are computable in ANSI SQL (the DuckDB oracle), keeping every
operator under the driver's value-hash correctness gate.

Scale notes (100 TB):
- exact dedup = hash-groupBy: map-side partial agg, shuffle only (sha, id).
- MinHash/LSH: the candidate-pair join shuffles on (band, signature) — band
  buckets are capped by the signature, so no quadratic blowup; only
  same-bucket pairs are compared. Exact-Jaccard verification then touches
  only candidate pairs.
- SimHash: banded self-join on 8-bit key prefixes (Hamming<=k with k<8
  guarantees at least one of 4 bands equal) instead of an O(n^2) cross join.

Reference parity: the reference has no dedup stage; these extend the engine
per the training-data-pipeline requirement (see repo brief). The tokenizer is
the shared one from functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mtix_spark.functions.text import tokenize

# MinHash universal-hash family over a prime > 2^32; a < 2^31 keeps a*h in
# signed-64 range (h < 2^32). Parameters are fixed constants so Spark and the
# SQL oracle agree bit-for-bit.
MINHASH_PRIME = 4294967311
N_PERM = 16
N_BANDS = 4
ROWS_PER_BAND = N_PERM // N_BANDS


def _perm_params(n_perm: int = N_PERM) -> list[tuple[int, int, int]]:
    """Deterministic (i, a, b) triples — a linear congruential family.
    Small fixed constants (no RNG) so the oracle SQL can embed them."""
    out = []
    a, b = 1103515245, 12345
    for i in range(n_perm):
        a = (a * 1664525 + 1013904223) % (1 << 31)
        b = (b * 22695477 + 1) % MINHASH_PRIME
        out.append((i, max(a, 1), b))
    return out


def token_hash(col: Column | str) -> Column:
    """32-bit token hash = first 8 hex chars of md5, as long.

    md5 keeps the function reproducible in any SQL engine (the oracle);
    at index-build scale this runs once per distinct (doc, term) pair.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via content-hash groupBy.

    Returns (content_sha, keeper_id, n_copies): the keeper is the minimum id
    in each identical-content group. Map-side partial agg + one shuffle on
    the 64-hex sha — the canonical at-scale exact-dedup plan.
    """
    return (
        docs.select(F.sha2(F.col(text_col), 256).alias("content_sha"), F.col(id_col))
        .groupBy("content_sha")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Token n-gram shingles (distinct) as array<string>.

    NOTE: as a pure Column expression this embeds the tokenize subtree
    inside the transform lambda, which Catalyst cannot CSE — fine for
    one-off use, but hot relational paths should go through
    `shingle_rows` (split-once; measured ~4-5× faster at sf0.1)."""
    toks = tokenize(col)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)])
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def shingle_rows(
    df: DataFrame, id_col: str, text_col: str, n: int, id_out: str = "id"
) -> DataFrame:
    """(id, sh) exploded DISTINCT token n-gram relation, split-once: the
    token array materializes as a column BEFORE the gram transform, so the
    regex tokenize runs exactly once per row (a Column-only shingles()
    re-evaluates it per gram element — the with_language_id CSE lesson)."""
    pre = df.select(
        F.col(id_col).alias(id_out), tokenize(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")
    grams_arr = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return pre.select(id_out, F.explode(grams_arr).alias("sh"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via shingle inverted join.

    Plan: explode distinct shingles -> self equi-join on shingle (the only
    shuffle, keyed by shingle so hot shingles spread via AQE skew split) ->
    per-pair intersection count -> Jaccard = |∩| / (|A|+|B|-|∩|).
    Only pairs sharing ≥1 shingle are ever materialized (not O(n²)).
    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6.
    """
    sh = shingle_rows(docs, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return jac


def contaminated_docs(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_id_col: str = "probe_id",
    probe_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing ≥1 token n-gram with
    any probe text (the held-out-set leak check every LLM training pipeline
    runs before a data release).

    Returns (doc_id, probe_id, n_shared) — distinct shared n-gram count per
    (doc, probe) pair. Plan: probe shingles (tiny relation) BROADCAST to an
    equi-join on the shingle string against the corpus shingles — the
    corpus side streams map-side, no shuffle of corpus data at all; only
    matching (doc, probe, shingle) rows reach the count aggregation. At
    100 TB the probe set (benchmarks) is always the small side, so the
    plan's broadcast shape is the right one at any corpus scale.
    """
    doc_sh = shingle_rows(docs, id_col, text_col, n, id_out="doc_id")
    probe_sh = shingle_rows(probes, probe_id_col, probe_text_col, n, id_out="probe_id")
    return (
        doc_sh.join(F.broadcast(probe_sh), "sh")
        .groupBy("doc_id", "probe_id")
        .agg(F.count_distinct("sh").alias("n_shared"))
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n_perm: int = N_PERM
) -> DataFrame:
    """(id, perm, minhash) — MinHash over distinct tokens.

    minhash_i(doc) = min over tokens of (a_i * h32(token) + b_i) mod P.
    The perm table (n_perm rows) broadcasts; the only shuffle is the
    groupBy (id, perm) min — partial-aggregated map-side.
    """
    spark = docs.sparkSession
    perms = spark.createDataFrame(_perm_params(n_perm), "perm int, a long, b long")
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("term"),
    ).withColumn("h", token_hash("term"))
    return (
        tok.crossJoin(F.broadcast(perms))
        .withColumn("hv", (F.col("a") * F.col("h") + F.col("b")) % F.lit(MINHASH_PRIME))
        .groupBy("id", "perm")
        .agg(F.min("hv").alias("minhash"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash-LSH near-dup pairs, verified by exact Jaccard on token sets.

    Band signatures (N_BANDS bands × ROWS_PER_BAND rows) bucket candidates;
    pairs sharing any band are exactly verified. Returns
    (id_a, id_b, jaccard) with id_a < id_b, jaccard = exact token-set
    Jaccard rounded to 6, filtered at `threshold`.

    Verification never ships token arrays per candidate pair (a near-dup-
    heavy corpus yields ~|cluster|² pairs per dup cluster; moving each
    doc's whole token set once per pair made this the slowest suite query).
    Two exact paths, picked by the candidate shard's vocabulary size:

    - **bitset kernel** (dense shards, vocab ≤ _BITSET_MAX_VOCAB): factorize
      the candidate docs' distinct terms, pack each doc's token set into a
      ⌈V/64⌉-word bit row, broadcast the (n_cand_docs × words) matrix, and
      compute |A∩B| = popcount(bits_a & bits_b) in a vectorized Arrow batch
      kernel over the pair relation — O(words) per pair at memory bandwidth,
      no token shuffle at all. This is the right tier post-banding: LSH has
      already localized candidates, so the shard's doc set (and with code/
      template-like corpora, its vocab) is small even when the corpus isn't.
    - **pair join** (fallback, unbounded vocab): equi-join the per-doc
      distinct-token arrays to the pair relation and `array_intersect` —
      the general plan whose shuffle is pairs × doclen.

    Both paths compute the identical integer |A∩B| and set sizes, so the
    rounded Jaccard is bit-equal to the SQL oracle either way.
    """
    # one-shuffle signatures: 16 min-aggregates over the token-hash relation
    # (same (a,b,P) family as minhash_signatures — identical values, but no
    # 16× crossJoin row blowup and no second shuffle), then band signatures
    # as string concat in the same projection
    tok = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("term"),
        )
        .withColumn("h", token_hash("term"))
        .persist()  # one tokenize+hash pass feeds signatures AND the bitset collect
    )
    mins = tok.groupBy("id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(
                f"m{i}"
            )
            for i, a, b in _perm_params()
        ]
    )
    band_structs = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws(
                ",",
                *[
                    F.col(f"m{bi * ROWS_PER_BAND + j}").cast("string")
                    for j in range(ROWS_PER_BAND)
                ],
            ).alias("bandsig"),
        )
        for bi in range(N_BANDS)
    ]
    bands = (
        mins.select("id", F.explode(F.array(*band_structs)).alias("bk"))
        .select("id", F.col("bk.band").alias("band"), F.col("bk.bandsig").alias("bandsig"))
        .persist()  # both sides of the self-join + the shard-kernel collect
    )
    a = bands.alias("a")
    b = bands.alias("b")
    raw = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bandsig") == F.col("b.bandsig"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.band").alias("band"),
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
    )
    # Path choice from distributed aggregates BEFORE any collect: an
    # eligibility probe costs one small agg over the already-persisted tok
    # relation; collecting (id, term) first and discovering the vocab is too
    # big would haul hundreds of millions of rows into the driver only to
    # throw them away (and the broadcast itself must fit executor/driver
    # memory — bounded in bytes, not doc count).
    probe = tok.agg(
        F.approx_count_distinct("id").alias("nd"),
        F.approx_count_distinct("term").alias("nt"),
        F.count(F.lit(1)).alias("rows"),
    ).collect()[0]
    if _bitset_path_eligible(int(probe["nd"]), int(probe["nt"]), int(probe["rows"])):
        # per-doc token sets from the persisted (id, term) relation
        by_doc: dict = {}
        for r in tok.select("id", "term").collect():
            by_doc.setdefault(r["id"], []).append(r["term"])
        doc_rows = [{"id": i, "ts": ts} for i, ts in by_doc.items()]
        vocab = sorted({t for ts in by_doc.values() for t in ts})
        if len(vocab) <= _BITSET_MAX_VOCAB:  # exact re-check (approx ±5%)
            return _verify_banded_bitset(raw, bands, doc_rows, vocab, threshold)
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(tokenize(F.col(text_col))).alias("ts"),
    )
    cand = raw.select("id_a", "id_b").distinct()
    return _verify_pairs_join(cand, toks, threshold)


# bitset fast path applies while the candidate shard's vocab packs into
# ≤ 256 words/doc (16384 terms) and the doc-bitset matrix stays a small
# broadcast; past that, the general pair join takes over.
_BITSET_MAX_VOCAB = 16_384
_BITSET_BROADCAST_BYTES = 64 << 20  # bits matrix + bandcodes together
_BITSET_MAX_TOKEN_ROWS = 5_000_000  # (id, term) rows the driver will collect


def _bitset_path_eligible(n_docs: int, n_terms: int, token_rows: int) -> bool:
    """Choose bitset vs pair-join from cheap distributed aggregates.

    All three inputs come from one agg over the (id, term) relation —
    nothing is collected before this passes. approx_count_distinct carries
    ~±5% error, so estimates are inflated by 10% here and the exact vocab
    size is re-checked after the collect. The byte budget covers both
    broadcast matrices: n_docs × ⌈V/64⌉ uint64 bitset words plus
    n_docs × N_BANDS int64 band codes.
    """
    nd = int(n_docs * 1.1) + 1
    nt = int(n_terms * 1.1) + 1
    if nt > _BITSET_MAX_VOCAB or token_rows > _BITSET_MAX_TOKEN_ROWS:
        return False
    n_words = max(1, -(-nt // 64))
    return nd * (n_words + N_BANDS) * 8 <= _BITSET_BROADCAST_BYTES


def _verify_banded_bitset(
    raw: DataFrame,
    bands: DataFrame,
    doc_rows: list,
    vocab: list,
    threshold: float,
) -> DataFrame:
    """Dense-shard verification over the raw (band, id_a, id_b) match
    relation — no distinct() shuffle, no token movement.

    Pair dedup across bands happens inside the kernel: with every doc's
    per-band signature codes in the broadcast, a pair is kept only in the
    FIRST band where the two signatures agree (each raw row agrees in its
    own band, so exactly one of its ≤N_BANDS occurrences survives,
    whichever partition it lives in — replacing a 10⁷-row distinct()
    exchange with a local vectorized test). |A∩B| is
    popcount(bits_a & bits_b) over packed token bitsets — O(words) per pair
    at memory bandwidth. The rounded threshold is re-applied in Spark so
    round() semantics match the SQL oracle exactly (the kernel pre-filters
    with a small margin).

    At 10¹²-doc scale the same kernel runs per LSH shard (banding has
    already localized candidates, bounding the broadcast); corpora whose
    shard vocab/doc count exceed the caps fall back to the relational
    pair join upstream.
    """
    import numpy as np

    spark = bands.sparkSession
    term_idx = {t: i for i, t in enumerate(vocab)}
    n_words = max(1, -(-len(vocab) // 64))
    ids = np.array([r["id"] for r in doc_rows], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    bits = np.zeros((len(ids), n_words), dtype=np.uint64)
    sizes = np.zeros(len(ids), dtype=np.int64)
    for row_pos, r in enumerate(doc_rows[i] for i in order):
        for t in r["ts"]:
            j = term_idx[t]
            bits[row_pos, j >> 6] |= np.uint64(1) << np.uint64(j & 63)
        sizes[row_pos] = len(r["ts"])

    # per-doc band-signature codes (interned strings -> ints) for the
    # first-matching-band dedup rule
    bandcode = np.zeros((len(ids), N_BANDS), dtype=np.int64)
    codes: dict[str, int] = {}
    for r in bands.collect():
        pos = int(np.searchsorted(ids, r["id"]))
        bandcode[pos, r["band"]] = codes.setdefault(r["bandsig"], len(codes))
    bc = spark.sparkContext.broadcast((ids, bits, sizes, bandcode))
    lut = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1).astype(np.int64)

    def kernel(batches):
        import pandas as pd

        b_ids, b_bits, b_sizes, b_bandcode = bc.value
        for pdf in batches:
            ia = np.searchsorted(b_ids, pdf["id_a"].to_numpy())
            ib = np.searchsorted(b_ids, pdf["id_b"].to_numpy())
            first = (b_bandcode[ia] == b_bandcode[ib]).argmax(axis=1)
            keep = first == pdf["band"].to_numpy()
            ia, ib = ia[keep], ib[keep]
            if not ia.size:
                continue
            inter_bits = b_bits[ia] & b_bits[ib]
            ni = lut[inter_bits.view(np.uint8)].reshape(len(ia), -1).sum(1)
            na, nb = b_sizes[ia], b_sizes[ib]
            jkeep = (ni / np.maximum(na + nb - ni, 1)) >= threshold - 1e-6
            yield pd.DataFrame(
                {
                    "id_a": b_ids[ia[jkeep]],
                    "id_b": b_ids[ib[jkeep]],
                    "__ni": ni[jkeep],
                    "__na": na[jkeep],
                    "__nb": nb[jkeep],
                }
            )

    counted = raw.mapInPandas(
        kernel, "id_a long, id_b long, __ni long, __na long, __nb long"
    )
    return (
        counted.withColumn(
            "jaccard",
            F.round(
                F.col("__ni")
                / (F.col("__na") + F.col("__nb") - F.col("__ni")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _verify_pairs_join(cand: DataFrame, toks: DataFrame, threshold: float) -> DataFrame:
    """General verification: token arrays joined to the pair relation."""
    ta = toks.select(F.col("id").alias("id_a"), F.col("ts").alias("ts_a"))
    tb = toks.select(F.col("id").alias("id_b"), F.col("ts").alias("ts_b"))
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("__ni", F.size(F.array_intersect("ts_a", "ts_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("__ni")
                / (F.size("ts_a") + F.size("ts_b") - F.col("__ni")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_clusters(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over a near-dup pair graph → canonical cluster
    ids: (id, cluster_id = min doc id reachable through near-dup edges).
    This is the step every dedup pipeline runs after candidate
    verification — pairs alone don't say which docs to drop; components do
    (keep cluster_id == id, drop the rest).

    Iterative min-label propagation, pure DataFrame joins: each round every
    node takes the min label among itself and its neighbors; converged when
    no label changes. Rounds ≈ graph diameter — near-dup clusters are dense
    (a dup cluster is near-cliquish), so this terminates in a handful of
    rounds; `localCheckpoint` truncates the growing plan each round. At
    10¹²-node scale the same loop runs with the large-star/small-star
    optimization (alternating propagation shapes gives O(log n) rounds);
    the fixpoint semantics — and this oracle-checked result — are
    identical.
    """
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    edges = edges.persist()
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("lbl"))
    labels = labels.localCheckpoint(eager=True)
    changed = 0
    for _ in range(max_iter):
        prop = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"), "lbl"
        )
        new = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.join(labels.withColumnRenamed("lbl", "old"), "id")
            .filter(F.col("lbl") < F.col("old"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    edges.unpersist()
    if changed:
        # returning partially-propagated labels would split one connected
        # component across cluster ids and silently retain duplicates —
        # fail loudly (long chain-shaped graphs can exceed max_iter)
        raise RuntimeError(
            f"dedup_clusters did not converge within {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter or use "
            "dedup_clusters_star (O(log n) rounds on chain-shaped graphs)"
        )
    return labels.select(F.col("id").alias(id_col), F.col("lbl").alias("cluster_id"))


def dedup_clusters_star(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_rounds: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") — the
    10¹²-node path: O(log n) rounds on ANY graph shape, including the long
    chains that defeat per-hop min-label propagation. Same fixpoint as
    `dedup_clusters`: (id, cluster_id = min doc id in the component).

    Each round is two grouped aggregations + joins over the edge relation:

    - large-star(u): every neighbor v > u re-attaches to
      m = min(Γ(u) ∪ {u}) — strictly-larger nodes hop to the neighborhood
      minimum, halving long tails.
    - small-star(u): every neighbor v ≤ u (and u itself) re-attaches to
      m = min(Γ≤(u) ∪ {u}) — collapses the remaining local stars.

    Both steps only ever decrease the partner of a node, so the edge
    relation converges to stars centered at component minima; convergence
    is detected by an order-insensitive hash of the canonical edge set.
    `localCheckpoint` truncates the growing plan per round, as in the
    propagation variant.
    """
    edges = pairs.select(
        F.least("id_a", "id_b").alias("a"), F.greatest("id_a", "id_b").alias("b")
    ).filter(F.col("a") != F.col("b")).distinct()
    edges = edges.localCheckpoint(eager=True)

    def edge_sig(e: DataFrame) -> tuple[int, int]:
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.expr("bit_xor(xxhash64(a, b))"), F.lit(0)
            ).alias("h"),  # xor: order-insensitive, overflow-free
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    def large_star(e: DataFrame) -> DataFrame:
        nbrs = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        m = nbrs.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            nbrs.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("m").alias("a"), F.col("v").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        nbrs = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        small = nbrs.filter(F.col("v") <= F.col("u"))
        m = small.groupBy("u").agg(F.min("v").alias("m"))
        re_v = small.join(m, "u").select(
            F.col("m").alias("a"), F.col("v").alias("b")
        )
        re_u = m.select(F.col("m").alias("a"), F.col("u").alias("b"))
        return (
            re_v.unionByName(re_u)
            .filter(F.col("a") != F.col("b"))
            .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
            .distinct()
        )

    sig = edge_sig(edges)
    converged = False
    for _ in range(max_rounds):
        edges = small_star(large_star(edges)).localCheckpoint(eager=True)
        new_sig = edge_sig(edges)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        raise RuntimeError(
            f"dedup_clusters_star did not converge within {max_rounds} rounds"
        )
    # fixpoint edges are stars (a = component min, b = member)
    labels = edges.select(F.col("b").alias("id"), F.col("a").alias("lbl"))
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(labels, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("lbl", "id").alias("cluster_id"),
        )
    )


def simhash32(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash) — 32-bit SimHash over tf-weighted token hashes.

    bit_j(sim) = 1 iff Σ_tokens tf · (2·bit_j(h32(token)) − 1) > 0.
    Pure Column math: explode → tf → cross join 32-row bit table (broadcast)
    → signed sum → bit pack. Two shuffles, both partial-aggregated.
    """
    spark = docs.sparkSession
    bits = spark.range(32).select(F.col("id").cast("int").alias("bit"))
    tf = (
        docs.select(F.col(id_col).alias("id"), F.explode(tokenize(F.col(text_col))).alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", token_hash("term"))
    )
    signed = (
        tf.crossJoin(F.broadcast(bits))
        .withColumn(
            "contrib",
            F.col("tf") * (F.expr("shiftright(h, bit) & 1") * 2 - 1),
        )
        .groupBy("id", "bit")
        .agg(F.sum("contrib").alias("s"))
    )
    return signed.groupBy("id").agg(
        F.sum(
            F.when(
                F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), bit)")
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def simhash_dup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance ≤ max_hamming.

    Banded join: the 32-bit hash splits into 4 byte-bands; d ≤ 3 < 4 bands
    pigeonholes ≥1 band equal, so candidates come from 4 equi-joins on a
    single byte — never an O(n²) cross join. Returns (id_a, id_b, hamming).
    """
    sim = simhash32(docs, id_col, text_col)
    banded = sim.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), 8 * i)
                        .bitwiseAND(F.lit(0xFF))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def boilerplate_ngrams(
    docs: DataFrame,
    n: int = 5,
    min_docs: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style boilerplate discovery, re-expressed over token n-grams
    (this corpus has no line structure): an n-gram occurring in ≥ min_docs
    DISTINCT docs is boilerplate (headers, license blurbs, templates) that
    a training pipeline strips or down-weights. One explode + one
    count-distinct-by-gram shuffle with map-side partial aggregation;
    output is the (tiny) boilerplate dictionary (gram, n_docs) — the scrub
    step broadcasts it back against the corpus, the corpus never
    self-joins."""
    # split-once: materialize the token array BEFORE the gram transform —
    # shingles() embeds the tokenize subtree inside the lambda n times,
    # which defeats Catalyst CSE (the with_language_id lesson; measured
    # 57s → ~3s at sf0.1 for this operator)
    grams = shingle_rows(docs, id_col, text_col, n).withColumnRenamed("sh", "gram")
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))  # ids distinct per doc already
        .filter(F.col("n_docs") >= min_docs)
    )


def duplicate_spans(
    docs: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact duplicated-substring spans (the "Deduplicating Training Data
    Makes Language Models Better" operator, re-grained from suffix-array
    bytes to token n-grams): every n-token gram occurring in >= min_docs
    DISTINCT documents marks its token positions; marked positions whose
    grams overlap or touch (position gap <= n) merge into maximal per-doc
    islands. Returns (doc_id, span_start, span_end, n_grams): the half-open
    token-coordinate span [span_start, span_end) plus how many duplicated
    grams it contains — a scrub step slices these spans out of the training
    text instead of dropping whole documents.

    Scale plan (100 TB): positional grams are built split-once (token array
    materialized before the gram transform — the CSE lesson); the
    duplicated-gram dictionary is ONE count-distinct aggregation with
    map-side partials keyed on the gram; membership flows back as a LEFT
    SEMI join on the gram (no payload duplication — and never a corpus
    self-join); island merging is a per-doc window after one shuffle on the
    doc id. A suffix array finds byte-exact spans of any length; gram-
    grained spans of length >= n are the standard distributed relaxation.
    """
    pre = docs.select(
        F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")
    grams_arr = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = pre.select("id", F.posexplode(grams_arr).alias("pos", "gram"))
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.count_distinct("id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gram")
    )
    marked = grams.join(dup_grams, "gram", "left_semi")
    w = Window.partitionBy("id").orderBy("pos")
    # island break when this gram does not overlap/touch the previous one;
    # coalesce puts the first row in island 1 (same CASE in the SQL oracle)
    marked = marked.withColumn(
        "brk",
        F.when(
            F.coalesce(F.col("pos") - F.lag("pos").over(w), F.lit(n + 1)) > n,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = marked.withColumn("island", F.sum("brk").over(w))
    return (
        islands.groupBy("id", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(n)).cast("long").alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select(F.col("id").alias(id_col), "span_start", "span_end", "n_grams")
    )


def scrub_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply duplicate_spans to the corpus: drop every token whose position
    falls inside any flagged [span_start, span_end) span of its document
    and re-join the survivors — span-level scrubbing keeps the unique parts
    of a document instead of dropping it whole. Returns
    (doc_id, clean_text, n_removed).

    Scale plan (100 TB): spans collapse to ONE small (start, end) list per
    affected doc (collect_list over the already-aggregated spans relation),
    joined back on the doc id — AQE broadcasts the span side when small,
    plain shuffle join otherwise; the positional token filter is a pure
    Column lambda (whole-stage codegen), so text never leaves the JVM.
    """
    sp = spans.groupBy(F.col(id_col).alias("id")).agg(
        F.collect_list(
            F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e"))
        ).alias("sp")
    )
    pre = docs.select(
        F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("__toks")
    )
    joined = pre.join(sp, "id", "left").withColumn(
        "sp",
        F.coalesce(F.col("sp"), F.array().cast("array<struct<s:bigint,e:bigint>>")),
    )
    kept = F.filter(
        F.col("__toks"),
        lambda t, i: ~F.exists(
            F.col("sp"), lambda q: (i >= q["s"]) & (i < q["e"])
        ),
    )
    return joined.select(
        F.col("id").alias(id_col),
        F.array_join(kept, " ").alias("clean_text"),
        (F.size("__toks") - F.size(kept)).cast("long").alias("n_removed"),
    )
