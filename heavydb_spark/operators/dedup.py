"""Deduplication operators for large-scale document corpora.

First-class training-data-pipeline components (BASELINE.json extension
surface; reference analogues are the similarity table functions,
QueryEngine/TableFunctions/SystemFunctions/os/SimilarityTableFunctions.hpp,
re-imagined for text dedup at 100 TB).

Scale design notes:
- Exact dedup is one hash-partitioned groupBy (map-side partial agg).
- MinHash/LSH follows the shingle → minhash → band → bucket-join shape:
  candidate generation is an equi-join on (band, signature) — a shuffle
  on a well-distributed key — NEVER an all-pairs cross join.
- All hashing is Spark-native xxhash64 (JVM codegen, deterministic across
  executors/runs) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------- exact

def exact_dedup_keys(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """One row per distinct key tuple: (min id, copy count).

    The canonical exact-dedup plan: hash-shuffle on the key, partial
    aggregation map-side. At 100 TB: one shuffle, no skew unless one
    document dominates (then AQE skew handling applies).
    """
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keeper_id"),
        F.count(F.lit(1)).alias("copies"),
    )


def exact_dedup_by_hash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Dedup on a fingerprint instead of the full text — at scale this
    shuffles 16-byte hashes, not documents."""
    return (
        df.withColumn("fp", F.md5(F.col(text_col)))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("copies"))
    )


# ------------------------------------------------------------- shingles


def _spread(df: DataFrame, key_col: str) -> DataFrame:
    """Hash-repartition on the key before CPU-heavy narrow transforms.

    A small single-file scan arrives as 1 partition; explode+hash would
    then run on one core. Partitioning by the key also pre-aligns the
    data with the downstream groupBy(key), so Catalyst elides the second
    shuffle — net cost is one small shuffle of raw rows.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, F.col(key_col))

def token_shingles(text_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (JVM higher-order
    functions; no UDF)."""
    tokens = F.split(F.trim(text_col), r"\s+")
    k = F.size(tokens) - (n - 1)
    return F.when(k <= 0, F.array(F.trim(text_col))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), k - 1),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(tokens, i + j + 1) for j in range(n)]
                ),
            )
        )
    )


# -------------------------------------------------------- exact jaccard

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (id_a < id_b).

    Plan shape: explode shingles → self equi-join on shingle (bounded by
    shared-shingle co-occurrence, not |docs|^2) → group pair → jaccard.
    At scale, hot shingles (stop-phrases) create join skew; mitigate by
    dropping shingles above a document-frequency cap (`max_df`).
    """
    sh = _shingle_rows(df, id_col, text_col, n).distinct()
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------- minhash/LSH

def _shingle_rows(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(doc, shingle) rows via slice + arrays_zip + one explode.

    slice/arrays_zip are plain expressions (whole-stage codegen, no
    lambda), and unlike the window-lead formulation there is no
    per-partition sort — measured ~40% faster at sf0.1. The lambda
    (`transform`) formulation is ~10x slower still: HOF bodies neither
    codegen nor CSE."""
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    k = F.greatest(F.size(tokens) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice(tokens, j + 1, k).alias(f"t{j}") for j in range(n)]
    )
    return (
        _spread(df, id_col)
        .select(F.col(id_col).alias("doc"), F.explode(zipped).alias("s"))
        .select(
            "doc",
            F.concat_ws(" ", *[F.col(f"s.t{j}") for j in range(n)]).alias(
                "shingle"
            ),
        )
    )


# Deterministic odd multipliers/offsets for affine rehashing
# h_i(x) = a_i * h(x) + b_i (mod 2^64) — splitmix64-style constants.
def _affine_constants(k: int) -> list[tuple[int, int]]:
    out = []
    s = 0x9E3779B97F4A7C15
    x = 0x243F6A8885A308D3
    for _ in range(k):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = x | 1  # odd multiplier
        x = (x * 6364136223846793005 + s) % (1 << 64)
        out.append((a, x))
    return out


def _to_i64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _minhash_wide(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 64,
) -> DataFrame:
    """Per-doc minhash signature in wide form: columns doc, m0..m{k-1}.

    Each shingle is hashed ONCE (xxhash64); the num_perm permutations
    are affine transforms a_i*h+b_i over the base hash, expressed as
    num_perm plain `min` aggregates — the whole pipeline is shuffle-on-
    doc + map-side partial aggregation, fully inside whole-stage
    codegen. Duplicate shingles need no dedup (min is idempotent).
    The wide form lets band hashes be computed as plain multi-arg
    xxhash64 over columns (codegen) instead of array slices (HOF).
    """
    base = _shingle_rows(df, id_col, text_col, n).select(
        "doc", F.xxhash64("shingle").alias("h")
    )
    consts = _affine_constants(num_perm)
    aggs = [
        F.min(
            F.col("h") * F.lit(_to_i64(a)).cast("long")
            + F.lit(_to_i64(b)).cast("long")
        ).alias(f"m{i}")
        for i, (a, b) in enumerate(consts)
    ]
    return base.groupBy("doc").agg(*aggs)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 64,
) -> DataFrame:
    """Per-doc minhash signature as an array<long> of length num_perm."""
    return _minhash_wide(df, id_col, text_col, n, num_perm).select(
        "doc",
        F.array(*[F.col(f"m{i}") for i in range(num_perm)]).alias("sig"),
    )


def _banded(wide: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(doc, band, band_hash) rows: band hash = multi-arg xxhash64 over
    that band's min columns — no higher-order functions, whole plan in
    codegen."""
    return wide.select(
        "doc",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[f"m{b * rows_per_band + j}" for j in range(rows_per_band)]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )


def minhash_lsh_candidates(
    sigs: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: docs agreeing on all rows of any band become a
    candidate pair. One explode (docs × bands) + equi-join on
    (band, band_hash) — the scale-safe candidate generator.
    Accepts wide (m0..mk) or array (sig) signature form."""
    if "sig" in sigs.columns:
        num_perm = bands * rows_per_band
        sigs = sigs.select(
            "doc",
            *[F.element_at("sig", i + 1).alias(f"m{i}") for i in range(num_perm)],
        )
    banded = _banded(sigs, bands, rows_per_band)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: candidates by banding, then
    verification by signature agreement ratio (jaccard estimate).
    Returns (doc_a, doc_b, est_jaccard). The wide signature relation is
    localCheckpoint'ed — it feeds both banding and verification, so the
    shingle+agg stages run once, and band/array projections off it stay
    in whole-stage codegen. Checkpoint (not persist): blocks are freed
    by the ContextCleaner when the result is garbage-collected, so
    repeated calls don't leak cache entries."""
    wide = _minhash_wide(df, id_col, text_col, n, num_perm).localCheckpoint(
        eager=False
    )
    cands = minhash_lsh_candidates(wide, bands, num_perm // bands)
    sig_arr = wide.select(
        "doc", F.array(*[F.col(f"m{i}") for i in range(num_perm)]).alias("sig")
    )
    a = sig_arr.withColumnRenamed("doc", "doc_a").withColumnRenamed("sig", "sig_a")
    b = sig_arr.withColumnRenamed("doc", "doc_b").withColumnRenamed("sig", "sig_b")
    est = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda eq: eq,
        )
    ) / F.lit(num_perm)
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("est_jaccard", 6).alias("est_jaccard"))
    )


# -------------------------------------------------------------- simhash

def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document, fully JVM-side.

    Token hashes vote per bit (+1/-1); the sign of each bit-sum forms the
    fingerprint. Implemented as explode → 64 conditional sums → bit
    reassembly with shiftleft/bitwise-or — one shuffle on doc id.
    """
    tok = _spread(df, id_col).select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("t"),
    ).withColumn("h", F.xxhash64("t"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = tok.groupBy("doc").agg(*votes)
    fp = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseOR(term)
    return agg.select("doc", fp.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs: block on 16-bit chunks (any chunk equal →
    candidate; by pigeonhole, hamming<=3 pairs share ≥1 of 4 chunks),
    verify with bit_count(xor).

    Recall contract: with 4 chunks the blocking GUARANTEES candidates
    only for hamming <= 3 (the default threshold). A larger
    `max_hamming` widens verification but pairs whose flips touch all
    four chunks can be missed — best-effort recall, as in practice
    near-dup flips concentrate. Exact recall at higher radii needs
    Manku-style multi-permutation tables (more blocking passes, same
    equi-join shape)."""
    fps = simhash64(df, id_col, text_col)
    chunked = fps.select(
        "doc",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 16 * c)
                    .bitwiseAND(F.lit(0xFFFF))
                    .cast("int")
                    for c in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a, b = chunked.alias("a"), chunked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) over the near-dup pair graph; component = min
    node id in the connected component — the cluster-collapse step that
    turns candidate pairs into a canonical-keeper assignment (each doc
    keeps component == its own id, duplicates point at their keeper).

    Min-label propagation: each round is one equi-join + min-aggregate,
    rounds ~ graph diameter (near-dup clusters are shallow — a few
    rounds). Iteration state is localCheckpoint'ed so repeated calls
    don't leak cache entries and lineage doesn't grow per round.
    """
    und = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    und = (
        und.union(
            und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        prop = (
            und.join(labels, und["dst"] == labels["node"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("label").alias("nbr"))
        )
        new_labels = (
            labels.join(prop, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
