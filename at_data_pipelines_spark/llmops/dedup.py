"""Deduplication operators for document corpora.

All hash functions are md5-derived (hex-prefix → int64) so results are
engine-independent and reproducible — the DuckDB oracle computes the exact
same integers (``('0x'||substr(md5(s),1,15))::BIGINT``).

Scale design (100 TB corpus):

- **exact_dedup** — one hash-shuffle on the digest; digests are uniform so
  no skew; map-side partial aggregation halves the shuffle.
- **MinHash** — signatures are computed in ONE pass over exploded shingles
  with k min-aggregates (no k× row blowup); the only wide shuffle is on
  doc_id (uniform). LSH banding then turns near-dup detection from O(n²)
  into a per-bucket join; hot buckets (boilerplate docs) are the skew risk
  — cap candidate generation per bucket or salt in production.
- **SimHash** — 32 conditional aggregates in one groupBy pass, not a
  32× bit-explosion.
- **Jaccard verify** — only on LSH candidates at scale; the all-pairs
  shingle join here is the small-data oracle shape.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash64(col: Column, seed: int | None = None) -> Column:
    """Deterministic 60-bit positive int64 hash of a string column
    (md5 hex prefix). Engine-independent, unlike murmur/xxhash."""
    s = col if seed is None else F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def hash32(col: Column) -> Column:
    """32-bit variant (for SimHash bit sampling)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group by content digest, keep the lowest id (deterministic winner)."""
    return df.groupBy(F.md5(F.col(text_col)).alias("content_hash")).agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies")
    )


def word_shingle_array(tokens_col: Column, n: int = 3) -> Column:
    """Array of distinct word n-gram shingles from a PRE-SPLIT token array
    column. The tokens must be a materialized column, not an inline
    ``split(...)`` expression: Spark does no common-subexpression
    elimination inside higher-order lambdas, so an inline split re-runs
    per element access — O(len²) per document (measured ~10× slower)."""
    w = tokens_col
    idx = F.sequence(F.lit(1), F.size(w) - (n - 1))
    gram = lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)])  # noqa: E731
    return F.when(F.size(w) >= n, F.array_distinct(F.transform(idx, gram))).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) rows, distinct per document."""
    toks = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_w"))
    return toks.select(
        F.col(id_col), F.explode(word_shingle_array(F.col("_w"), n)).alias("shingle")
    )


# universal-hash family for MinHash permutations: h_i = (a_i·h + b_i) mod p
# over a 28-bit md5-derived base hash. p = 2^31−1 (prime); a_i·h ≤ 2^61 so
# the product never overflows signed int64 in any engine. Coefficients are
# fixed (seeded) so Spark and the SQL oracle agree exactly.
MINHASH_PRIME = 2147483647


def minhash_coefficients(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    import numpy as np

    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(1, MINHASH_PRIME)), int(rng.integers(0, MINHASH_PRIME)))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 8, shingle_n: int = 3
) -> DataFrame:
    """MinHash signature per document: mh_i = MIN over shingles of
    (a_i·h(shingle) + b_i) mod p. ONE md5 per shingle + k cheap integer
    permutations (k separate salted md5s would dominate the runtime),
    aggregated in a single groupBy pass."""
    sh = word_shingles(df, text_col, id_col, shingle_n)
    base = F.conv(F.substring(F.md5(F.col("shingle")), 1, 7), 16, 10).cast("long")
    sh = sh.select(F.col(id_col), base.alias("h"))
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(minhash_coefficients(num_hashes))
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_bands(sig: DataFrame, id_col: str, bands: int, rows_per_band: int) -> DataFrame:
    """Explode a signature into (id, band, band_key) — docs agreeing on all
    rows of any band land in the same bucket.

    Single pass: one explode of a per-row band array (a union of per-band
    selects would recompute the signature pipeline `bands` times)."""
    structs = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}").cast("string") for r in range(rows_per_band)]
        structs.append(
            F.struct(
                F.lit(b).alias("band"), F.md5(F.concat_ws(",", *cols)).alias("band_key")
            )
        )
    return sig.select(F.col(id_col), F.explode(F.array(*structs)).alias("_b")).select(
        id_col, F.col("_b.band").alias("band"), F.col("_b.band_key").alias("band_key")
    )


def lsh_candidate_pairs(bands_df: DataFrame, id_col: str) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing any band bucket.

    The join key (band, band_key) is the bucket — per-bucket cost is
    |bucket|²; production caps or salts hot buckets.
    """
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash → LSH bands → candidate near-dup pairs."""
    assert num_hashes % bands == 0
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    return lsh_candidate_pairs(lsh_bands(sig, id_col, bands, num_hashes // bands), id_col)


def jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, threshold: float, shingle_n: int = 3
) -> DataFrame:
    """Exact n-gram Jaccard over documents sharing ≥1 shingle.

    Shape: equi-join of the (id, shingle) relation with itself on shingle,
    count per pair, then attach per-doc set sizes. All derivations reuse
    the same exploded relation, so Spark's exchange reuse materializes the
    shingle pipeline once. (Two alternatives benchmarked slower: per-doc
    ``size(shingle_array)`` sizes — the higher-order transform runs
    interpreted, outside codegen — and bucket-explode pair combinations,
    ~1.5× slower for the same reason.)

    Skew: a boilerplate shingle shared by k docs contributes k²/2 joined
    rows on one key — at corpus scale, drop super-frequent shingles (they
    carry no near-dup signal) and/or verify only LSH candidates
    (``minhash_candidates``) instead of all co-occurring pairs.
    """
    # join on xxhash64(shingle) instead of the shingle string: 8-byte keys
    # shrink the shuffle ~3× and compare faster. A 64-bit collision would
    # miscount an intersection with probability ~(n_distinct)²/2⁶⁵ —
    # ~1e-10 at millions of shingles — far below fp noise elsewhere.
    sh = word_shingles(df, text_col, id_col, shingle_n).select(
        F.col(id_col), F.xxhash64("shingle").alias("sh_h")
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh_h") == F.col("b.sh_h"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """SimHash fingerprint over whitespace tokens (occurrence-weighted).

    One groupBy with ``bits`` conditional aggregates — no row blowup.
    """
    toks = df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    h = hash32(F.col("tok"))
    sums = [
        F.sum(F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"s_{b}")
        for b in range(bits)
    ]
    per_doc = toks.groupBy(id_col).agg(*sums)
    fp = reduce(
        lambda acc, b: acc
        + F.when(F.col(f"s_{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long")),
        range(bits),
        F.lit(0).cast("long"),
    )
    return per_doc.select(F.col(id_col), fp.alias("simhash"))


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components by iterative min-label propagation
    (label(n) converges to MIN(id) over n's component — a unique
    fixpoint, so any engine/algorithm agrees exactly).

    The driver loop runs O(component diameter) rounds; near-dup clusters
    are shallow (diameter ≲ 5), so a handful of uniform-key shuffles.
    Each round: push labels across edges, take the min per node. This is
    the GraphFrames/Pregel CC without the dependency.
    """
    spark = nodes.sparkSession
    bi = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
        .persist()
    )
    labels = nodes.select(F.col(node_col).alias("node"), F.col(node_col).alias("label")).persist()
    try:
        for _ in range(max_iter):
            pushed = (
                bi.join(labels, bi.src == labels.node)
                .select(F.col("dst").alias("node"), "label")
            )
            new_labels = (
                labels.unionByName(pushed)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
                .persist()
            )
            changed = (
                new_labels.join(labels.withColumnRenamed("label", "old"), "node")
                .filter(F.col("label") < F.col("old"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        return labels.select(F.col("node").alias(node_col), F.col("label").alias("cluster"))
    finally:
        bi.unpersist()
        _ = spark  # session kept for API symmetry


def dedup_clusters(
    df: DataFrame, text_col: str, id_col: str, threshold: float = 0.6, shingle_n: int = 3
) -> DataFrame:
    """Full near-dup dedup: Jaccard pairs → connected components →
    (id, cluster) with cluster = min id of the duplicate group; keep rows
    where id == cluster for the deduplicated corpus."""
    pairs = jaccard_pairs(df, text_col, id_col, threshold, shingle_n)
    nodes = df.select(F.col(id_col))
    return connected_components(nodes, pairs, id_col, "id_a", "id_b")


def simhash_near_dups(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3, bits: int = 32
) -> DataFrame:
    """Pairs with Hamming(simhash) ≤ max_hamming.

    Small-data shape: all-pairs bit_count(xor). Scale path: split the
    fingerprint into (max_hamming+1) bands — by pigeonhole a pair within
    the radius agrees exactly on ≥1 band — equi-join per band, then verify.
    """
    s = simhash(df, text_col, id_col, bits)
    a = s.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("ha"))
    b = s.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("hb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
