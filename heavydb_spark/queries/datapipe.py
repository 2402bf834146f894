"""Training-data pipeline operators (BASELINE.json extension surface):
dedup, similarity search, text analysis — over documents/embeddings.

Approximate sketches (minhash, simhash, LSH ANN) have no SQL oracle
(engine-specific hashing) → rows-only driver check; every exact variant
is fully oracle-verified.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from heavydb_spark.operators import dedup, pipeline, similarity, text
from heavydb_spark.queries.registry import query
from heavydb_spark.queries.util import T, range_spread

# --------------------------------------------------------------- dedup


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS fp, min(doc_id) AS keeper_id, count(*) AS copies
    FROM documents GROUP BY md5(text) ORDER BY fp
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup by content hash — one hash-shuffle groupBy."""
    d = T(spark, sf_dir, "documents")
    return dedup.exact_dedup_by_hash(d, "text", "doc_id").orderBy("fp")


@query(
    "dedup_fingerprint",
    oracle="""
    SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                                   '\\s+', ' ', 'g'))) AS fp,
           min(doc_id) AS keeper_id,
           count(*) AS copies
    FROM documents
    GROUP BY 1 ORDER BY fp
    """,
)
def dedup_fingerprint(spark, sf_dir):
    """Normalization-fingerprint dedup (rolling-hash analogue — text.py
    fingerprint: lowercase → strip non-alnum → collapse ws → md5)."""
    d = T(spark, sf_dir, "documents")
    return (
        d.withColumn("fp", text.fingerprint(F.col("text")))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("copies"),
        )
        .orderBy("fp")
    )


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH sh AS (
        SELECT DISTINCT doc_id AS doc, shingle
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, len(string_split_regex(trim(text), '\\s+')) - 1),
                       i -> concat_ws(' ',
                            string_split_regex(trim(text), '\\s+')[i],
                            string_split_regex(trim(text), '\\s+')[i+1],
                            string_split_regex(trim(text), '\\s+')[i+2])
                   )) AS shingle
            FROM documents
        )
    ), sizes AS (
        SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc
    ), inter AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
        GROUP BY a.doc, b.doc
    )
    SELECT doc_a, doc_b,
           round(CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc = doc_a
    JOIN sizes sb ON sb.doc = doc_b
    WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.2
    ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs (shingle equi-join blocking —
    operators/dedup.py ngram_jaccard_pairs)."""
    d = T(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.2
    ).orderBy("doc_a", "doc_b")


@query("dedup_minhash_lsh")  # xxhash64-based sketch → rows-only check
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup candidates: shingle → minhash(64 perms) →
    16 bands → bucket equi-join → signature-agreement estimate."""
    d = T(spark, sf_dir, "documents")
    return dedup.minhash_dedup_pairs(
        d, "doc_id", "text", n=3, num_perm=64, bands=16, threshold=0.2
    ).orderBy("doc_a", "doc_b")


@query("dedup_simhash")  # xxhash64-based sketch → rows-only check
def dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs: 64-bit fingerprints, 16-bit chunk
    blocking, hamming<=12 verification."""
    d = T(spark, sf_dir, "documents")
    return dedup.simhash_neardup_pairs(d, "doc_id", "text", max_hamming=12).orderBy(
        "doc_a", "doc_b"
    )


# ---------------------------------------------------- similarity search

# The ANN/top-k entry points take a literal query vector (the right API
# shape — at scale the query vector arrives as a parameter, not a scan).
# These catalog queries use vec_id 0's embedding as that literal; fetch
# it once per fixture dir instead of running a Spark job per call.
_QVEC_CACHE: dict[str, tuple] = {}


def _query_vec(spark, sf_dir: str):
    if sf_dir not in _QVEC_CACHE:
        e = T(spark, sf_dir, "embeddings")
        _QVEC_CACHE[sf_dir] = tuple(
            e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
        )
    return list(_QVEC_CACHE[sf_dir])


@query(
    "sim_cosine_topk",
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           round(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[]))
                 / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])))), 6) AS cos_sim
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
)
def sim_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k (the exactness baseline): O(n·d) scan,
    no shuffle until TakeOrdered. Query vector = vec_id 0."""
    e = T(spark, sf_dir, "embeddings")
    qvec = _query_vec(spark, sf_dir)
    return similarity.cosine_topk(
        e.filter(F.col("vec_id") != 0), "embedding", qvec, k=10
    )


def _sql_arr(p) -> str:
    """A float64 vector as a SQL list literal (repr round-trips exactly)."""
    return "[" + ", ".join(repr(float(v)) for v in p) + "]"


def _sql_bucket(planes, v: str) -> str:
    """The DuckDB text of similarity.lsh_bucket over expression `v`:
    sign bit per (inlined, seeded) hyperplane packed into an integer."""
    return " + ".join(
        f"{1 << i} * (CASE WHEN list_dot_product({v}, "
        f"{_sql_arr(planes[i])}) >= 0 THEN 1 ELSE 0 END)"
        for i in range(len(planes))
    )


def _lsh_oracle(n_planes: int = 4, dim: int = 64, seed: int = 42,
                k: int = 10) -> str:
    """Exact oracle for the LSH index: the hyperplanes are seeded
    (similarity.hyperplanes), so their float64 values inline as SQL
    literals (repr round-trips exactly) and DuckDB recomputes both the
    query's bucket and every vector's bucket — the 'approximate' index
    is deterministic given its planes, hence exactly checkable. The
    fixture embeddings are 64-dim at every scale factor."""
    planes = similarity.hyperplanes(dim, n_planes, seed)

    def bucket(v):
        return _sql_bucket(planes, v)

    return f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id = 0),
    qb AS (SELECT ({bucket('qv')}) AS qbucket FROM q),
    b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id <> 0)
    SELECT vec_id,
           round(list_dot_product(v, qv)
                 / (sqrt(list_dot_product(v, v))
                    * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
    FROM b, q, qb
    WHERE ({bucket('v')}) = qbucket
    ORDER BY cos_sim DESC, vec_id LIMIT {k}
    """


@query("sim_ann_lsh", oracle=_lsh_oracle())
def sim_ann_lsh(spark, sf_dir):
    """ANN top-k via random-hyperplane LSH bucket probe — the 100 TB
    scale path (bucket column precomputable + partition-prunable).
    Oracle-exact: the seeded hyperplanes are inlined into the SQL, so
    DuckDB reproduces the bucket assignment bit for bit."""
    e = T(spark, sf_dir, "embeddings")
    qvec = _query_vec(spark, sf_dir)
    return similarity.ann_topk_lsh(
        e.filter(F.col("vec_id") != 0), "embedding", qvec, k=10, n_planes=4
    )


@query(
    "sim_scalar_quantize",
    oracle="""
    WITH x AS (
        SELECT vec_id,
               list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v
        FROM embeddings
    ), d AS (
        SELECT u.i AS dim, min(v[u.i]) AS mn, max(v[u.i]) AS mx
        FROM x, unnest(range(1, 65)) AS u(i)
        GROUP BY u.i
    ), s AS (
        SELECT list(mn ORDER BY dim) AS mins,
               list(mx ORDER BY dim) AS maxs
        FROM d
    ), q AS (
        SELECT vec_id, v, mins, maxs,
               list_transform(range(1, 65), i ->
                   CASE WHEN maxs[i] > mins[i]
                        THEN CAST(floor((v[i] - mins[i])
                                        / (maxs[i] - mins[i]) * 255
                                        + 0.5) AS INTEGER)
                        ELSE 0 END) AS codes
        FROM x, s
    ), dq AS (
        SELECT vec_id, v, codes,
               list_transform(range(1, 65), i ->
                   mins[i] + codes[i] * 1.0e0 / 255
                             * (maxs[i] - mins[i])) AS deq
        FROM q
    ), e AS (
        SELECT vec_id, codes, deq, v,
               list_transform(range(1, 65), i ->
                   abs(v[i] - deq[i])) AS err
        FROM dq
    )
    SELECT vec_id, array_to_string(codes, ',') AS codes_csv,
           floor(list_aggregate(err, 'max') * 1.0e6 + 0.5) / 1.0e6
               AS max_abs_err,
           floor(list_sum(list_transform(err, x -> x * x)) / 64
                 * 1.0e9 + 0.5) / 1.0e9 AS mse,
           round(list_dot_product(v, deq)
                 / (sqrt(list_dot_product(v, v))
                    * sqrt(list_dot_product(deq, deq))), 6)
               AS cos_dequant
    FROM e ORDER BY vec_id
    """,
)
def sim_scalar_quantize(spark, sf_dir):
    """SQ8 scalar quantization of the embedding corpus
    (operators/similarity.py scalar_quantize): per-dimension min/max
    codes plus the per-vector quality report (max abs error, MSE,
    cosine of dequantized vs original) a recall-vs-memory decision
    reads. Exact oracle: the per-dim stats, half-up code rounding
    (stable floor form), dequantization, and index-ordered error
    folds replay identically in DuckDB list arithmetic.  The result
    projects the codes as a CSV string (`codes_csv`) — the driver's
    pandas canonicalizer cannot sort array-typed columns (r6 ERR);
    the array form stays in the operator API."""
    e = T(spark, sf_dir, "embeddings")
    return (
        similarity.scalar_quantize(e, "embedding", "vec_id", bits=8)
        .select(
            "vec_id",
            F.array_join(F.col("codes").cast("array<string>"), ",").alias(
                "codes_csv"
            ),
            "max_abs_err",
            "mse",
            "cos_dequant",
        )
        .orderBy("vec_id")
    )


@query("sim_pq_encode")  # sampled-Lloyd codebooks — rows-only check
def sim_pq_encode(spark, sf_dir):
    """Product quantization of the embedding corpus
    (operators/similarity.py pq_train/pq_encode/pq_reconstruction,
    Jegou et al. 2011): 8 subspaces x 16 centroids -> 8 nibble codes
    per 64-dim vector (64x vs float32) plus the per-vector squared
    reconstruction error. Codebooks train on a bounded deterministic
    driver sample (the FAISS regime); encoding is inline-literal JVM
    argmin per subspace — codegen over the scan, no Python on
    executors. Iterative trained model -> rows-only; the algebraic
    contract lives in `sim_pq_invariants`.  Codes project as a CSV
    string (`codes_csv`) — raw arrays crash the driver canonicalizer
    (r6 ERR); the array form stays in the operator API."""
    e = T(spark, sf_dir, "embeddings")
    books = similarity.pq_train(e, "embedding", "vec_id")
    return (
        similarity.pq_reconstruction(e, "embedding", books, "vec_id")
        .select(
            "vec_id",
            F.array_join(F.col("codes").cast("array<string>"), ",").alias(
                "codes_csv"
            ),
            "recon_sq_err",
        )
        .orderBy("vec_id")
    )


@query(
    "sim_pq_invariants",
    oracle="""
    SELECT true AS codes_in_range, true AS deterministic_rerun,
           true AS planted_copy_top2, true AS recon_beats_mean
    """,
)
def sim_pq_invariants(spark, sf_dir):
    """Driver-checked PQ contracts (the rows-only `sim_pq_encode`'s
    exact companion): (1) every code is in [0, 16); (2) a re-train +
    re-encode reproduces the codes exactly (seeded sample, seeded
    Lloyd); (3) a planted exact copy of vec 0 shares vec 0's codes,
    so ADC search with vec 0's embedding returns both in its top-2 at
    equal distance; (4) mean squared reconstruction error beats the
    rank-0 baseline (quantizing every vector to the corpus mean)."""
    e = T(spark, sf_dir, "embeddings")
    books = similarity.pq_train(e, "embedding", "vec_id")
    books2 = similarity.pq_train(e, "embedding", "vec_id")
    enc1 = similarity.pq_encode(e, "embedding", books, "vec_id").select(
        "vec_id", "codes"
    )
    enc2 = (
        similarity.pq_encode(e, "embedding", books2, "vec_id")
        .select("vec_id", F.col("codes").alias("codes2"))
    )
    code_checks = enc1.join(enc2, "vec_id").agg(
        F.bool_and(
            F.forall("codes", lambda c: (c >= 0) & (c < 16))
        ).alias("codes_in_range"),
        F.bool_and(F.col("codes") == F.col("codes2")).alias(
            "deterministic_rerun"
        ),
    )
    qvec = _query_vec(spark, sf_dir)
    planted = (
        e.filter(F.col("vec_id") == 0)
        .select(F.lit(900000).alias("vec_id"), "embedding", "label")
        .select(e.columns)
    )
    top2 = similarity.pq_search_adc(
        e.unionByName(planted), "embedding", qvec, books, k=2,
    )
    t2 = top2.agg(
        (
            (F.collect_set("vec_id") == F.array(F.lit(0), F.lit(900000)))
            | (F.collect_set("vec_id") == F.array(F.lit(900000), F.lit(0)))
        ).alias("ids_ok"),
        (F.count_distinct("adc_dist") == 1).alias("dist_eq"),
    ).select((F.col("ids_ok") & F.col("dist_eq")).alias(
        "planted_copy_top2"
    ))
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    mean_vec = (
        e.select(F.posexplode(xd).alias("d", "x"))
        .groupBy("d").agg(F.avg("x").alias("mu"))
        .agg(F.array_sort(F.collect_list(F.struct("d", "mu"))).alias("s"))
        .select(F.transform("s", lambda t: t["mu"]).alias("mu"))
    )
    base_err = (
        e.crossJoin(F.broadcast(mean_vec))
        .select(
            F.aggregate(
                F.zip_with(xd, F.col("mu"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("e0")
        )
        .agg(F.avg("e0").alias("mean_base"))
    )
    pq_err = (
        similarity.pq_reconstruction(e, "embedding", books, "vec_id")
        .agg(F.avg("recon_sq_err").alias("mean_pq"))
    )
    better = pq_err.crossJoin(base_err).select(
        (F.col("mean_pq") < F.col("mean_base")).alias("recon_beats_mean")
    )
    return (
        code_checks.crossJoin(t2).crossJoin(better).select(
            "codes_in_range", "deterministic_rerun",
            "planted_copy_top2", "recon_beats_mean",
        )
    )


@query("sim_ann_ivfpq")  # KMeans + sampled-Lloyd models -> rows-only check
def sim_ann_ivfpq(spark, sf_dir):
    """IVF-PQ composite ANN (operators/similarity.py ann_topk_ivfpq,
    the FAISS IndexIVFPQ shape): coarse-quantizer list pruning
    (scan nprobe/n_lists of the data) + ADC code scoring inside the
    probed lists (m lookup-table reads per vector) — the full
    memory-AND-compute scale path.  Residual encoding (PQ over
    x - centroid[list]) is the DEFAULT since r8, matching FAISS
    IndexIVFPQ — this catalog query exercises it argument-free;
    `residual=False` opts back into raw-vector PQ. Trained models ->
    rows-only; the contracts live in `sim_ann_ivfpq_invariants`."""
    e = T(spark, sf_dir, "embeddings")
    qvec = _query_vec(spark, sf_dir)
    return similarity.ann_topk_ivfpq(
        e.filter(F.col("vec_id") != 0), "embedding", qvec, k=10,
        n_lists=8, nprobe=2,
    )


@query(
    "sim_ann_ivfpq_invariants",
    oracle="""
    SELECT true AS planted_copy_found, true AS probe_subset,
           true AS deterministic_rerun, true AS residual_planted_copy,
           true AS residual_improves_recon
    """,
)
def sim_ann_ivfpq_invariants(spark, sf_dir):
    """Driver-checked IVF-PQ contracts: (1) an exact copy of the
    query vector lands in the query's own coarse list with the
    query's own codes, so it MUST appear in the top-k at the minimum
    attainable ADC distance; (2) the probed result set is a subset of
    the corpus scored by full-scan ADC with the same codebooks (list
    pruning only removes rows, never rescores); (3) a re-run
    reproduces the ranking exactly (seeded KMeans, seeded sampled
    Lloyd); (4) the planted copy survives in RESIDUAL mode — which
    since r8 is the argument-free DEFAULT and must agree exactly with
    an explicit residual=True call (contracts 1-3 pin residual=False,
    the raw-PQ opt-out, whose subset check scores against raw
    full-scan ADC) — (the
    copy shares the query's list, hence its residual and codes);
    (5) residual encoding (the FAISS IndexIVFPQ default, r6 verdict
    queue #6) beats raw-vector PQ on mean reconstruction error at the
    identical m x ksub code budget — the reason it exists."""
    e = T(spark, sf_dir, "embeddings")
    qvec = _query_vec(spark, sf_dir)
    with_copy = e.unionByName(
        e.filter(F.col("vec_id") == 0)
        .select(F.lit(900000).alias("vec_id"), "embedding", "label")
        .select(e.columns)
    )
    top = similarity.ann_topk_ivfpq(
        with_copy, "embedding", qvec, k=5, n_lists=8, nprobe=2,
        residual=False,  # raw-mode contracts (subset vs raw full-scan)
    ).collect()
    top2 = similarity.ann_topk_ivfpq(
        with_copy, "embedding", qvec, k=5, n_lists=8, nprobe=2,
        residual=False,
    ).collect()
    ids = [r["vec_id"] for r in top]
    dmin = min(r["adc_dist"] for r in top)
    planted = (
        0 in ids and 900000 in ids
        and all(
            r["adc_dist"] == dmin for r in top if r["vec_id"] in (0, 900000)
        )
    )
    books = similarity.pq_train(with_copy, "embedding", "vec_id")
    full = {
        r["vec_id"]: r["adc_dist"]
        for r in similarity.pq_search_adc(
            with_copy, "embedding", qvec, books, k=1000
        ).collect()
    }
    subset = all(
        r["vec_id"] in full and full[r["vec_id"]] == r["adc_dist"]
        for r in top
    )
    rerun = [(r["vec_id"], r["adc_dist"]) for r in top] == [
        (r["vec_id"], r["adc_dist"]) for r in top2
    ]
    # the DEFAULT call is residual mode since r8 (FAISS IndexIVFPQ
    # default; verdict r7 queue #7) — exercise it argument-free and
    # require it to agree exactly with an explicit residual=True call
    rtop = similarity.ann_topk_ivfpq(
        with_copy, "embedding", qvec, k=5, n_lists=8, nprobe=2,
    ).collect()
    rtop_explicit = similarity.ann_topk_ivfpq(
        with_copy, "embedding", qvec, k=5, n_lists=8, nprobe=2,
        residual=True,
    ).collect()
    default_is_residual = [
        (r["vec_id"], r["adc_dist"]) for r in rtop
    ] == [(r["vec_id"], r["adc_dist"]) for r in rtop_explicit]
    rmin = min(r["adc_dist"] for r in rtop)
    r_ids = [r["vec_id"] for r in rtop]
    resid_planted = (
        default_is_residual
        and 0 in r_ids and 900000 in r_ids
        and all(
            r["adc_dist"] == rmin for r in rtop
            if r["vec_id"] in (0, 900000)
        )
    )
    # same-budget, same-data reconstruction A/B: both codebooks train
    # on `e` (raw vs coarse residuals); residual codebooks explain
    # what the coarse quantizer didn't, so mean squared error drops
    indexed, cents = similarity.ivf_index(e, "embedding", n_lists=8)
    resid_df = indexed.withColumn(
        "__resid", similarity.list_residual_col(cents, "embedding")
    )
    rbooks = similarity.pq_train(resid_df, "__resid", "vec_id")
    books_e = similarity.pq_train(e, "embedding", "vec_id")
    raw_mse = (
        similarity.pq_reconstruction(e, "embedding", books_e, "vec_id")
        .agg(F.avg("recon_sq_err").alias("m")).first()["m"]
    )
    res_mse = (
        similarity.pq_reconstruction(resid_df, "__resid", rbooks, "vec_id")
        .agg(F.avg("recon_sq_err").alias("m")).first()["m"]
    )
    resid_better = res_mse < raw_mse
    return spark.createDataFrame(
        [(planted, subset, rerun, resid_planted, resid_better)],
        "planted_copy_found boolean, probe_subset boolean, "
        "deterministic_rerun boolean, residual_planted_copy boolean, "
        "residual_improves_recon boolean",
    )


@query("sim_ann_ivf")  # KMeans-trained index (iterative MLlib) -> rows-only check
def sim_ann_ivf(spark, sf_dir):
    """ANN top-k via IVF (KMeans coarse quantizer + nprobe list probe) —
    the data-adaptive scale path: with the table partitioned by list_id
    a probe scans nprobe/n_lists of the data (operators/similarity.py
    ann_topk_ivf)."""
    e = T(spark, sf_dir, "embeddings")
    qvec = _query_vec(spark, sf_dir)
    return similarity.ann_topk_ivf(
        e.filter(F.col("vec_id") != 0), "embedding", qvec, k=10,
        n_lists=8, nprobe=2,
    )


@query(
    "sim_embedding_neardup",
    oracle="""
    WITH base AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id < 50
    ), cand AS (
        SELECT vec_id, embedding FROM base
        UNION ALL
        SELECT vec_id + 1000 AS vec_id, embedding FROM base
    ), scored AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),
                     6) AS cos_sim
        FROM cand a JOIN cand b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cos_sim FROM scored
    WHERE cos_sim >= 0.8 ORDER BY id_a, id_b
    """,
)
def sim_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs via LSH blocking + exact verify.

    The fixture's random embeddings have max pairwise cosine ~0.51, so
    at threshold 0.8 the natural pair set is empty; the query plants
    exact duplicates (vec_id + 1000 copies of vec_id < 50) on BOTH
    sides so the check is non-vacuous. Identical vectors share every
    hyperplane sign, hence always collide in the LSH bucket — blocking
    provably loses none of the >=0.8 pairs here (no natural pair comes
    near the threshold), which is what makes the exact oracle valid for
    an approximate blocking scheme."""
    e = T(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") < 50).select("vec_id", "embedding")
    dup = base.select(
        (F.col("vec_id") + 1000).alias("vec_id"), F.col("embedding")
    )
    return similarity.embedding_neardup_pairs(
        base.unionByName(dup),
        threshold=0.8,
        n_planes=4,
        dim=len(_query_vec(spark, sf_dir)),
    ).orderBy("id_a", "id_b")


# -------------------------------------------------------- text analysis


@query(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           length(text) AS n_chars_m,
           len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
           CAST(list_sum(list_transform(string_split_regex(trim(text), '\\s+'),
                                        w -> CAST(ceil(length(w) / 4.0) AS INT))) AS INT) AS n_bpe_ish
    FROM documents ORDER BY doc_id
    """,
)
def text_token_stats(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish subword estimate
    (operators/text.py)."""
    d = range_spread(T(spark, sf_dir, "documents"), "doc_id")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_m"),
        text.token_count(F.col("text")).alias("n_tokens"),
        text.bpe_ish_token_count(F.col("text")).cast("int").alias("n_bpe_ish"),
    ).sortWithinPartitions("doc_id")


@query(
    "text_quality",
    oracle="""
    SELECT doc_id,
           length(text) AS q_chars,
           len(string_split_regex(trim(text), '\\s+')) AS q_tokens,
           round(length(text) / len(string_split_regex(trim(text), '\\s+')), 4) AS q_avg_token_len,
           round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text), 4) AS q_alpha_ratio,
           round(length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text), 4) AS q_digit_ratio,
           round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / length(text), 4) AS q_punct_ratio,
           round(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                 t -> t IN ('the', 'a', 'of', 'and'))) * 1.0
                 / len(string_split_regex(trim(text), '\\s+')), 4) AS q_stopword_ratio
    FROM documents ORDER BY doc_id
    """,
)
def text_quality(spark, sf_dir):
    """Quality scoring: length/alpha/digit/punct/stopword ratios."""
    d = range_spread(T(spark, sf_dir, "documents"), "doc_id")
    return text.quality_features(d).select(
        "doc_id",
        "q_chars",
        "q_tokens",
        "q_avg_token_len",
        "q_alpha_ratio",
        "q_digit_ratio",
        "q_punct_ratio",
        "q_stopword_ratio",
    ).sortWithinPartitions("doc_id")


@query(
    "text_lang_id",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
               len(list_filter(string_split_regex(lower(text), '\\s+'),
                   t -> t IN ('the','a','of','and'))) AS s_en,
               len(list_filter(string_split_regex(lower(text), '\\s+'),
                   t -> t IN ('el','la','de','y'))) AS s_es,
               len(list_filter(string_split_regex(lower(text), '\\s+'),
                   t -> t IN ('le','la','de','et'))) AS s_fr,
               len(list_filter(string_split_regex(lower(text), '\\s+'),
                   t -> t IN ('der','die','das','und'))) AS s_de,
               len(list_filter(string_split_regex(lower(text), '\\s+'),
                   t -> t IN ('de5','le5','shi4','he2'))) AS s_zh
        FROM documents
    )
    SELECT doc_id, lang,
           CASE
             WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
             WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
             WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
             WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
             WHEN s_fr >= greatest(s_zh) THEN 'fr'
             ELSE 'zh'
           END AS pred_lang
    FROM scored ORDER BY doc_id
    """,
)
def text_lang_id(spark, sf_dir):
    """Language-ID heuristic: argmax of per-language marker-token counts,
    first-in-code-order tie-break ('de' < 'en' < 'es' < 'fr' < 'zh') —
    mirrored exactly in the oracle CASE chain."""
    d = range_spread(T(spark, sf_dir, "documents"), "doc_id")
    return d.select(
        "doc_id", "lang", text.lang_id(F.col("text")).alias("pred_lang")
    ).sortWithinPartitions("doc_id")


@query(
    "mm_media_features",
    oracle="""
    SELECT doc_id AS media_id,
           'image' AS kind,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_hash,
           0 AS feat_dim
    FROM documents WHERE doc_id < 500 ORDER BY media_id
    """,
)
def mm_media_features(spark, sf_dir):
    """Multimodal feature extraction over opaque binary payloads via
    Arrow-batched mapInPandas (operators/multimodal.py). Payloads are the
    utf-8 bytes of document text so the byte-level features (length,
    md5) are oracle-checkable; a real corpus would carry encoded
    image/audio bytes through the identical plan."""
    from heavydb_spark.operators.multimodal import extract_features

    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(0).alias("width"),
        F.lit(0).alias("height"),
        F.lit(0).cast("long").alias("duration_ms"),
    )
    return extract_features(media).select(
        "media_id", "kind", "n_bytes", "payload_hash", "feat_dim"
    ).orderBy("media_id")


@query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id AS media_id, unnest(generate_series(0, (doc_id % 10000) + 499, 1000)) AS frame_ts_ms
    FROM documents WHERE doc_id < 200 ORDER BY media_id, frame_ts_ms
    """,
)
def mm_frame_sample(spark, sf_dir):
    """Video frame-sampling plan (operators/multimodal.py
    sample_video_frames): one row per sampled frame timestamp derived
    from metadata duration_ms = doc_id % 10000 + 500; only pixel decode
    is stubbed, the explode fan-out is the real scale path."""
    from heavydb_spark.operators.multimodal import sample_video_frames

    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.lit(None).cast("binary").alias("payload"),
        F.lit("video/mp4").alias("mime"),
        F.lit(0).alias("width"),
        F.lit(0).alias("height"),
        (F.col("doc_id") % 10000 + 500).alias("duration_ms"),
    )
    return sample_video_frames(media, every_ms=1000).orderBy(
        "media_id", "frame_ts_ms"
    )


@query(
    "llm_transform_template",
    oracle="""
    SELECT doc_id,
           'Summarize in one line: ' || substring(text, 1, 40) AS llm_out
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
)
def llm_transform_template(spark, sf_dir):
    """LLM_TRANSFORM (Shared/sqldefs.h:134) with the deterministic
    template backend: the Arrow-batched mapInPandas plumbing is the real
    scale path; the model call is pluggable (operators/llm.py; the
    endpoint backend is stubbed in this container)."""
    from heavydb_spark.operators.llm import llm_transform

    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
        "doc_id", F.substring("text", 1, 40).alias("snippet")
    )
    return llm_transform(
        d, "snippet", "Summarize in one line: {input}"
    ).select("doc_id", "llm_out").orderBy("doc_id")


@query(
    "tf_feature_query_similarity",
    oracle="""
    WITH v AS (
        SELECT l_suppkey AS key, l_returnflag AS feature,
               CAST(sum(l_quantity) AS DOUBLE) AS val
        FROM lineitem GROUP BY 1, 2
    ), q(feature, qval) AS (
        VALUES ('A', 1.0), ('N', 2.0), ('R', 0.5)
    ), norms AS (
        SELECT key, sqrt(sum(val * val)) AS norm FROM v GROUP BY key
    ), dots AS (
        SELECT key, sum(val * qval) AS dot
        FROM v JOIN q USING (feature) GROUP BY key
    )
    SELECT n.key AS l_suppkey,
           round(coalesce(d.dot, 0) / (n.norm * sqrt(1.0 + 4.0 + 0.25)), 6)
               AS cos_sim
    FROM norms n LEFT JOIN dots d ON n.key = d.key
    ORDER BY l_suppkey
    """,
)
def tf_feature_query_similarity(spark, sf_dir):
    """tf_feature_similarity (SimilarityTableFunctions.hpp): per-key
    sparse feature vectors vs one broadcast query vector — sparse
    algebra on long format, no cross join."""
    li = T(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.col("l_suppkey"),
        F.col("l_returnflag").alias("feature"),
        F.col("l_quantity").alias("metric"),
    )
    return similarity.feature_similarity(
        pairs, "l_suppkey", "feature", "metric",
        {"A": 1.0, "N": 2.0, "R": 0.5},
    ).orderBy("l_suppkey")


@query(
    "dedup_connected_components",
    oracle="""
    WITH RECURSIVE sh AS (
        SELECT DISTINCT doc_id AS doc, shingle
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, len(string_split_regex(trim(text), '\\s+')) - 1),
                       i -> concat_ws(' ',
                            string_split_regex(trim(text), '\\s+')[i],
                            string_split_regex(trim(text), '\\s+')[i+1],
                            string_split_regex(trim(text), '\\s+')[i+2])
                   )) AS shingle
            FROM documents
        )
    ), sizes AS (
        SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc
    ), inter AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
        GROUP BY a.doc, b.doc
    ), prs AS (
        SELECT doc_a, doc_b FROM inter
        JOIN sizes sa ON sa.doc = doc_a
        JOIN sizes sb ON sb.doc = doc_b
        WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.2
    ), und AS (
        SELECT doc_a AS src, doc_b AS dst FROM prs
        UNION SELECT doc_b, doc_a FROM prs
    ), reach AS (
        SELECT src AS node, src AS r FROM und
        UNION
        SELECT u.src, reach.r FROM und u JOIN reach ON u.dst = reach.node
    )
    SELECT node AS doc_id, min(r) AS canonical_id
    FROM reach GROUP BY node ORDER BY doc_id
    """,
)
def dedup_connected_components(spark, sf_dir):
    """Near-dup cluster collapse: exact n-gram Jaccard pairs ->
    connected components -> canonical keeper per cluster (min doc_id).
    The step that turns pairwise candidates into a dedup keep-list;
    oracle = DuckDB recursive-CTE reachability with min aggregation."""
    d = T(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.2)
    return (
        dedup.connected_components(pairs)
        .select(F.col("node").alias("doc_id"), F.col("component").alias("canonical_id"))
        .orderBy("doc_id")
    )


# ------------------------------------------- pipeline build operators

# Portable multiplicative hash used by the sampling/mixing queries —
# identical arithmetic in Spark and the DuckDB oracle (operators/
# pipeline.py portable_hash).
_PH_DOC = pipeline.portable_hash_sql("doc_id")


@query(
    "pipe_decontaminate",
    oracle="""
    WITH sh AS (
        SELECT DISTINCT doc_id, shingle
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, len(string_split_regex(trim(text), '\\s+')) - 1),
                       i -> concat_ws(' ',
                            string_split_regex(trim(text), '\\s+')[i],
                            string_split_regex(trim(text), '\\s+')[i+1],
                            string_split_regex(trim(text), '\\s+')[i+2])
                   )) AS shingle
            FROM documents
        )
    ), tr AS (
        SELECT doc_id AS train_id, shingle FROM sh WHERE doc_id % 10 <> 0
    ), te AS (
        SELECT doc_id AS test_id, shingle FROM sh WHERE doc_id % 10 = 0
    )
    SELECT train_id, test_id, count(*) AS n_shared
    FROM tr JOIN te USING (shingle)
    GROUP BY train_id, test_id
    HAVING count(*) >= 2
    ORDER BY train_id, test_id
    """,
)
def pipe_decontaminate(spark, sf_dir):
    """Benchmark decontamination: train docs (doc_id % 10 != 0) sharing
    >= 2 distinct 3-grams with any held-out doc (doc_id % 10 == 0).
    Shingle equi-join with the tiny test side broadcast — the n-gram
    contamination check of an LLM corpus build."""
    d = T(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 10 != 0)
    test = d.filter(F.col("doc_id") % 10 == 0)
    return pipeline.decontaminate_ngram(
        train, test, "doc_id", "text", n=3, min_overlap=2
    ).orderBy("train_id", "test_id")


@query(
    "pipe_sample_stratified",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, source, ({_PH_DOC}) AS ph FROM documents
    ), r AS (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY ph, doc_id) AS rn
        FROM h
    )
    SELECT source, doc_id FROM r WHERE rn <= 10 ORDER BY source, doc_id
    """,
)
def pipe_sample_stratified(spark, sf_dir):
    """Deterministic stratified sample: 10 docs per source, chosen by
    portable-hash order (a seeded without-replacement draw both
    engines reproduce exactly)."""
    d = T(spark, sf_dir, "documents")
    return (
        pipeline.sample_stratified(d, "source", "doc_id", 10)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    )


# Weights keyed on the sources the documents fixture actually contains
# (src0..src19), with integer cutoffs precomputed in Python — int()
# truncates while SQL CAST rounds, so the oracle inlines the exact
# cutoff constants instead of recomputing them from the float weight.
_MIX_WEIGHTS = {"src0": 0.5, "src1": 0.9, "src2": 0.25}
_MIX_CUTS = {s: int(w * pipeline._M31) for s, w in _MIX_WEIGHTS.items()}


@query(
    "pipe_mix_sources",
    oracle=f"""
    SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM (
        SELECT source, n_chars, ({_PH_DOC}) AS ph FROM documents
    )
    WHERE ph < CASE source
        WHEN 'src0' THEN {_MIX_CUTS['src0']}
        WHEN 'src1' THEN {_MIX_CUTS['src1']}
        WHEN 'src2' THEN {_MIX_CUTS['src2']}
        ELSE 0 END
    GROUP BY source ORDER BY source
    """,
)
def pipe_mix_sources(spark, sf_dir):
    """Weighted source mixing (src0 50% / src1 90% / src2 25%, others
    dropped): the data-mixture step of a corpus build as one
    deterministic codegen'd filter — no shuffle, no sampling state."""
    d = T(spark, sf_dir, "documents")
    mixed = pipeline.mix_sources(d, "source", "doc_id", _MIX_WEIGHTS)
    return (
        mixed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("source")
    )


@query(
    "pipe_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           {pipeline.pii_scrub_sql("concat(text, ' reach me: user', doc_id, '@example.com or +1 555-123-4567, ssn 123-45-6789, host 10.0.0.', doc_id % 256)")} AS scrubbed
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id
    """,
)
def pipe_pii_scrub(spark, sf_dir):
    """PII redaction (email/phone/SSN/IPv4 -> typed placeholders) as
    chained regexp_replace. The fixture text carries no PII, so the
    query plants a deterministic PII suffix per doc on BOTH sides —
    the parity check is non-vacuous."""
    d = T(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" reach me: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1 555-123-4567, ssn 123-45-6789, host 10.0.0."),
        (F.col("doc_id") % 256).cast("string"),
    )
    return (
        d.filter(F.col("doc_id") < 100)
        .select("doc_id", pipeline.pii_scrub(planted).alias("scrubbed"))
        .orderBy("doc_id")
    )


@query(
    "pipe_pack_sequences",
    oracle="""
    WITH RECURSIVE docs AS (
        SELECT source, doc_id,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents
    ), pack AS (
        SELECT source, doc_id, n_tokens, rn,
               CAST(0 AS BIGINT) AS bin_id, n_tokens AS bin_fill
        FROM docs WHERE rn = 1
        UNION ALL
        SELECT d.source, d.doc_id, d.n_tokens, d.rn,
               CASE WHEN p.bin_fill + d.n_tokens > 120
                    THEN p.bin_id + 1 ELSE p.bin_id END,
               CASE WHEN p.bin_fill + d.n_tokens > 120
                    THEN d.n_tokens ELSE p.bin_fill + d.n_tokens END
        FROM docs d
        JOIN pack p ON d.source = p.source AND d.rn = p.rn + 1
    )
    SELECT source, doc_id, n_tokens, bin_id, bin_fill
    FROM pack ORDER BY source, doc_id
    """,
)
def pipe_pack_sequences(spark, sf_dir):
    """Greedy sequence packing to a 120-token budget per (source) bin —
    the packing step that turns documents into fixed-length training
    sequences. Spark runs the sequential reset recurrence one Arrow
    batch per group (applyInPandas); the oracle replays it as a
    DuckDB recursive CTE."""
    d = T(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
    )
    return pipeline.pack_sequences(
        toks, "source", "doc_id", "n_tokens", budget=120
    ).orderBy("source", "doc_id")


@query(
    "pipe_tokenize_pack",
    oracle=r"""
    WITH RECURSIVE tokc AS (
        SELECT source, doc_id,
               CAST(sum(len(w) + 1
                        - (len(w) - len(replace(w, 'ta', '|'))))
                    AS BIGINT) AS n_tokens
        FROM (SELECT source, doc_id,
                     unnest(string_split_regex(trim(text), '\s+')) AS w
              FROM documents) t
        GROUP BY source, doc_id
    ), docs AS (
        SELECT source, doc_id, n_tokens,
               row_number() OVER (
                   PARTITION BY source ORDER BY doc_id) AS rn
        FROM tokc
    ), pack AS (
        SELECT source, doc_id, n_tokens, rn,
               CAST(0 AS BIGINT) AS bin_id, n_tokens AS bin_fill
        FROM docs WHERE rn = 1
        UNION ALL
        SELECT d.source, d.doc_id, d.n_tokens, d.rn,
               CASE WHEN p.bin_fill + d.n_tokens > 500
                    THEN p.bin_id + 1 ELSE p.bin_id END,
               CASE WHEN p.bin_fill + d.n_tokens > 500
                    THEN d.n_tokens ELSE p.bin_fill + d.n_tokens END
        FROM docs d
        JOIN pack p ON d.source = p.source AND d.rn = p.rn + 1
    )
    SELECT source, bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM pack GROUP BY source, bin_id
    ORDER BY source, bin_id
    """,
)
def pipe_tokenize_pack(spark, sf_dir):
    """Tokenizer-aware sequence packing as ONE dataflow: per-doc BPE
    subword counts (the `text_bpe_encode_contract` merge, so the
    token accounting is oracle-exact) feed the greedy 500-subword
    packing recurrence, summarized per (source, bin): doc count,
    token total, id span. Packing by the REAL tokenizer's counts —
    not whitespace counts — is what the training loader actually
    needs; whitespace packing overfills bins by the subword factor.
    Plan: the encode is a broadcast decorate join + one doc groupBy,
    packing shuffles once on the source, the summary re-aggregates
    in place. The oracle composes the substring-count formula with
    the packing recursive CTE."""
    d = T(spark, sf_dir, "documents")
    counts = text.bpe_encode_docs(
        d, "doc_id", "text", merges=[("t", "a")]
    ).select("doc_id", "n_subwords")
    toks = (
        d.select("source", "doc_id")
        .join(counts, "doc_id")
        .select("source", "doc_id", F.col("n_subwords").alias("n_tokens"))
    )
    packed = pipeline.pack_sequences(
        toks, "source", "doc_id", "n_tokens", budget=500
    )
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "bin_id")
    )


@query(
    "pipe_dictionary_encode",
    oracle="""
    WITH dl AS (
        SELECT lang AS value,
               dense_rank() OVER (ORDER BY lang) - 1 AS code
        FROM (SELECT DISTINCT lang FROM documents WHERE lang IS NOT NULL)
    ), ds AS (
        SELECT source AS value,
               dense_rank() OVER (ORDER BY source) - 1 AS code
        FROM (SELECT DISTINCT source FROM documents WHERE source IS NOT NULL)
    )
    SELECT d.doc_id, dl.code AS lang_code, ds.code AS source_code
    FROM documents d
    LEFT JOIN dl ON dl.value = d.lang
    LEFT JOIN ds ON ds.value = d.source
    ORDER BY d.doc_id
    """,
)
def pipe_dictionary_encode(spark, sf_dir):
    """String-dictionary encoding (StringDictionary/StringDictionary.cpp;
    TEXT ENCODING DICT of Shared/sqltypes.h): dense value-ordered codes
    built without a single-partition window (range partition + local
    row_number + broadcast offsets), applied via broadcast join."""
    d = T(spark, sf_dir, "documents")
    encoded, _ = pipeline.dictionary_encode(d, ["lang", "source"])
    return encoded.select(
        "doc_id",
        F.col("lang_code").cast("long").alias("lang_code"),
        F.col("source_code").cast("long").alias("source_code"),
    ).orderBy("doc_id")


@query(
    "text_repetition",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
        FROM documents
    ), b AS (
        SELECT doc_id, words,
               list_transform(
                   range(1, len(words)),
                   i -> concat_ws(' ', words[i], words[i+1])
               ) AS bigrams
        FROM w
    )
    SELECT doc_id,
           round(list_max(list_transform(list_distinct(words),
                     x -> len(list_filter(words, y -> y = x)))) * 1.0
                 / len(words), 4) AS r_top_word,
           round(list_max(list_transform(list_distinct(bigrams),
                     x -> len(list_filter(bigrams, y -> y = x)))) * 1.0
                 / len(bigrams), 4) AS r_top_bigram,
           round(len(list_distinct(words)) * 1.0 / len(words), 4) AS r_distinct
    FROM b ORDER BY doc_id
    """,
)
def text_repetition(spark, sf_dir):
    """Repetition quality signals (Gopher-style boilerplate filters):
    most-frequent-word fraction, most-frequent-bigram fraction, and
    distinct-token ratio per document (operators/text.py
    repetition_features) — pure JVM higher-order expressions."""
    d = T(spark, sf_dir, "documents")
    return text.repetition_features(d).select(
        "doc_id", "r_top_word", "r_top_bigram", "r_distinct"
    ).orderBy("doc_id")


@query(
    "pipe_dedup_keep_best",
    oracle="""
    WITH k AS (
        SELECT doc_id,
               CAST(substr(source, 4) AS INTEGER) AS prio,
               concat_ws(' ',
                   string_split_regex(trim(text), '\\s+')[1],
                   string_split_regex(trim(text), '\\s+')[2]) AS cluster
        FROM documents
    ), r AS (
        SELECT cluster, doc_id, prio,
               row_number() OVER (
                   PARTITION BY cluster ORDER BY prio, doc_id) AS rn,
               count(*) OVER (PARTITION BY cluster) AS n_dups,
               min(prio) OVER (PARTITION BY cluster) AS best_priority
        FROM k
    )
    SELECT cluster, doc_id AS keep_id, best_priority, n_dups
    FROM r WHERE rn = 1
    ORDER BY cluster, keep_id
    """,
)
def pipe_dedup_keep_best(spark, sf_dir):
    """Cross-corpus dedup policy: cluster on a normalized 2-token
    prefix (standing in for any duplicate-cluster key) and keep the
    copy from the best source (lowest source number, ties by doc_id) —
    the keep-the-curated-copy rule of a multi-corpus build. Spark side
    is a single min_by aggregation (one shuffle, map-side combinable);
    the oracle's window formulation is value-identical."""
    d = T(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    keyed = d.select(
        "doc_id",
        F.substring("source", 4, 10).cast("int").alias("prio"),
        F.concat_ws(" ", toks.getItem(0), toks.getItem(1)).alias("cluster"),
    )
    return (
        pipeline.dedup_keep_best(keyed, "cluster", "prio", "doc_id")
        .orderBy("cluster", "keep_id")
    )


# ------------------------- portable-hash sketch variants (exact oracle)
#
# The xxhash64 sketches above get rows-only driver checks (xxhash64 is
# JVM-only). These companion queries run the SAME sketch pipelines on
# the portable 31-bit hash (operators/dedup.portable_token_hash), so
# DuckDB replays every step — fingerprint votes, chunk blocking,
# hamming verify, minhash permutations, banding, est-jaccard — and the
# driver hash-checks the sketch algorithms end to end.


def _simhash_portable_oracle(max_hamming: int = 12) -> str:
    h1 = dedup.portable_token_hash_sql("t", 1)
    h2 = dedup.portable_token_hash_sql("t", 2)
    return f"""
    WITH tok0 AS (
        SELECT doc_id AS doc,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS t0
        FROM documents
    ), tok AS (
        SELECT doc, substr(t0, 1, 64) AS t FROM tok0 WHERE t0 <> ''
    ), hh AS (
        SELECT doc, ({h1}) * 2147483648 + ({h2}) AS h FROM tok
    ), bits AS (
        SELECT doc, b,
               sum(CASE WHEN (h >> CAST(b AS INTEGER)) & 1 = 1
                        THEN 1 ELSE -1 END) AS v
        FROM hh CROSS JOIN range(0, 64) r(b) GROUP BY doc, b
    ), fp AS (
        SELECT doc,
               sum(CASE WHEN v > 0
                        THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER))
                        ELSE 0 END) AS simhash
        FROM bits GROUP BY doc
    ), ch AS (
        SELECT doc, simhash, c,
               (simhash >> CAST(16 * c AS INTEGER)) & 65535 AS chunk
        FROM fp CROSS JOIN range(0, 4) r(c)
    ), pairs AS (
        SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
               a.simhash AS sa, b.simhash AS sb
        FROM ch a JOIN ch b
          ON a.c = b.c AND a.chunk = b.chunk AND a.doc < b.doc
    )
    SELECT doc_a, doc_b, bit_count(xor(sa, sb)) AS hamming
    FROM pairs WHERE hamming <= {max_hamming}
    ORDER BY doc_a, doc_b
    """


@query("dedup_simhash_portable", oracle=_simhash_portable_oracle())
def dedup_simhash_portable(spark, sf_dir):
    """SimHash near-dup pairs on the portable token hash: the full
    fingerprint/blocking/hamming pipeline value-checked cross-engine
    (the xxhash64 `dedup_simhash` stays the production path)."""
    d = T(spark, sf_dir, "documents")
    return dedup.simhash_neardup_pairs(
        d,
        "doc_id",
        "text",
        max_hamming=12,
        token_hash=dedup.portable_token_hash62,
    ).orderBy("doc_a", "doc_b")


def _minhash_portable_oracle(
    num_perm: int = 64, bands: int = 16, threshold: float = 0.5
) -> str:
    consts = dedup._affine_constants_m31(num_perm)
    m31 = 2_147_483_647
    hs = dedup.portable_token_hash_sql("s", 3)
    rpb = num_perm // bands
    mins = ", ".join(
        f"min((h * {a} + {b}) % {m31}) AS m{i}"
        for i, (a, b) in enumerate(consts)
    )
    band_or = " OR ".join(
        "("
        + " AND ".join(
            f"a.m{b * rpb + j} = b.m{b * rpb + j}" for j in range(rpb)
        )
        + ")"
        for b in range(bands)
    )
    eq_sum = " + ".join(
        f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)"
        for i in range(num_perm)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id AS doc,
               regexp_split_to_array(trim(text), '\\s+') AS ts
        FROM documents
    ), sh AS (
        SELECT doc,
               unnest(list_transform(range(0, greatest(len(ts) - 2, 0)),
                   i -> ts[CAST(i + 1 AS INTEGER)] || ' ' ||
                        ts[CAST(i + 2 AS INTEGER)] || ' ' ||
                        ts[CAST(i + 3 AS INTEGER)])) AS s
        FROM tok
    ), hh AS (
        SELECT doc, ({hs}) AS h FROM sh
    ), sig AS (
        SELECT doc, {mins} FROM hh GROUP BY doc
    ), cand AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b, ({eq_sum}) AS eq
        FROM sig a JOIN sig b ON a.doc < b.doc AND ({band_or})
    )
    SELECT doc_a, doc_b,
           round(eq / {num_perm}.0, 6) AS est_jaccard
    FROM cand WHERE eq / {num_perm}.0 >= {threshold}
    ORDER BY doc_a, doc_b
    """


@query("dedup_minhash_portable", oracle=_minhash_portable_oracle())
def dedup_minhash_portable(spark, sf_dir):
    """MinHash+LSH near-dup pairs on the portable hash with affine
    permutations mod 2^31-1: shingle → min-agg → band equi-join →
    signature-agreement verify, every value replayed by the oracle
    (the xxhash64 `dedup_minhash_lsh` stays the production/bench
    path)."""
    d = T(spark, sf_dir, "documents")
    return dedup.minhash_dedup_pairs_portable(
        d, "doc_id", "text", threshold=0.5
    ).orderBy("doc_a", "doc_b")


# ------------------------------------- end-to-end corpus curation chain
#
# The flagship composition: the stages a real pre-training corpus runs
# through, chained as ONE dataflow and oracle-checked as one unit —
# plant PII -> scrub -> quality filter -> exact dedup (normalization
# fingerprint) -> near-dup collapse (3-gram Jaccard pairs + connected
# components) -> deterministic hash sample. Every stage reuses a
# kernel whose oracle is individually proven above; this query proves
# the COMPOSITION (column flow, survivor joins, stage ordering).


def _end_to_end_oracle() -> str:
    planted = (
        "concat(text, ' contact user', doc_id, "
        "'@example.com for details')"
    )
    scrub = pipeline.pii_scrub_sql(planted)
    cut = int(0.8 * 2_147_483_647)
    phash = pipeline.portable_hash_sql("doc_id")
    return f"""
    WITH RECURSIVE raw AS (
        SELECT doc_id, {scrub} AS text FROM documents
    ), q AS (
        SELECT doc_id, text,
               len(string_split_regex(trim(text), '\\s+')) AS toks,
               round(len(list_filter(string_split_regex(lower(text), '\\s+'),
                   t -> t IN ('the', 'a', 'of', 'and'))) * 1.0
                   / len(string_split_regex(trim(text), '\\s+')), 4) AS stopr
        FROM raw
    ), kept AS (
        SELECT doc_id, text FROM q WHERE toks >= 30 AND stopr >= 0.03
    ), fps AS (
        SELECT doc_id, text,
               md5(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g'))) AS fp
        FROM kept
    ), keepers AS (
        SELECT fp, min(doc_id) AS keeper FROM fps GROUP BY fp
    ), exact_kept AS (
        SELECT f.doc_id, f.text FROM fps f
        JOIN keepers k ON f.fp = k.fp AND f.doc_id = k.keeper
    ), sh AS (
        SELECT DISTINCT doc_id AS doc, shingle
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, len(string_split_regex(trim(text), '\\s+')) - 1),
                       i -> concat_ws(' ',
                            string_split_regex(trim(text), '\\s+')[i],
                            string_split_regex(trim(text), '\\s+')[i+1],
                            string_split_regex(trim(text), '\\s+')[i+2])
                   )) AS shingle
            FROM exact_kept
        )
    ), sizes AS (
        SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc
    ), inter AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
        GROUP BY a.doc, b.doc
    ), prs AS (
        SELECT doc_a, doc_b FROM inter
        JOIN sizes sa ON sa.doc = doc_a
        JOIN sizes sb ON sb.doc = doc_b
        WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.2
    ), und AS (
        SELECT doc_a AS src, doc_b AS dst FROM prs
        UNION SELECT doc_b, doc_a FROM prs
    ), reach AS (
        SELECT src AS node, src AS r FROM und
        UNION
        SELECT u.src, reach.r FROM und u JOIN reach ON u.dst = reach.node
    ), comp AS (
        SELECT node, min(r) AS canon FROM reach GROUP BY node
    ), near_kept AS (
        SELECT e.doc_id, e.text FROM exact_kept e
        LEFT JOIN comp c ON e.doc_id = c.node
        WHERE c.node IS NULL OR c.canon = e.doc_id
    ), sampled AS (
        SELECT doc_id, text FROM near_kept WHERE ({phash}) < {cut}
    )
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+')) AS tokens,
           md5(text) AS text_hash
    FROM sampled ORDER BY doc_id
    """


@query("pipe_end_to_end_corpus", oracle=_end_to_end_oracle())
def pipe_end_to_end_corpus(spark, sf_dir):
    """End-to-end corpus curation: PII scrub -> quality filter ->
    exact dedup -> near-dup cluster collapse -> deterministic sample,
    as one dataflow (each kernel individually oracled above; this
    proves the composition). Scale shape: scrub/quality/sample are
    scan-level codegen, exact dedup one fingerprint shuffle, near-dup
    the shingle equi-join + bounded label propagation — no stage
    materializes to the driver."""
    d = T(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com for details"),
    )
    raw = d.select("doc_id", pipeline.pii_scrub(planted).alias("text"))
    q = text.quality_features(raw)
    kept = q.filter(
        (F.col("q_tokens") >= 30) & (F.col("q_stopword_ratio") >= 0.03)
    ).select("doc_id", "text")
    fps = kept.withColumn("fp", text.fingerprint(F.col("text")))
    keepers = fps.groupBy("fp").agg(F.min("doc_id").alias("keeper"))
    exact_kept = (
        fps.join(keepers, "fp")
        .filter(F.col("doc_id") == F.col("keeper"))
        .select("doc_id", "text")
        .localCheckpoint(eager=False)
    )
    pairs = dedup.ngram_jaccard_pairs(
        exact_kept, "doc_id", "text", n=3, threshold=0.2
    )
    comp = dedup.connected_components(pairs).select(
        F.col("node"), F.col("component").alias("canon")
    )
    near_kept = (
        exact_kept.join(comp, exact_kept["doc_id"] == comp["node"], "left")
        .filter(F.col("node").isNull() | (F.col("canon") == F.col("doc_id")))
        .select("doc_id", "text")
    )
    sampled = pipeline.sample_hash(near_kept, "doc_id", 0.8)
    return sampled.select(
        "doc_id",
        text.token_count(F.col("text")).alias("tokens"),
        F.md5("text").alias("text_hash"),
    ).orderBy("doc_id")


@query(
    "pipe_corpus_report",
    oracle=r"""
    WITH d AS (
        SELECT lang, source, n_chars,
               len(string_split_regex(trim(text), '\s+')) AS toks,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
                   / length(text) AS alpha,
               count(*) OVER (PARTITION BY md5(text)) AS copies
        FROM documents
    )
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS total_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(alpha), 4) AS avg_alpha_ratio,
           round(sum(CASE WHEN copies > 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS dup_ratio,
           round(quantile_cont(n_chars, 0.5), 1) AS median_chars
    FROM d GROUP BY lang, source ORDER BY lang, source
    """,
)
def pipe_corpus_report(spark, sf_dir):
    """Corpus statistics report — the per-(lang, source) summary a
    training-data team reads before mixing: document/token/char
    volumes, mean alpha-ratio quality, exact-duplicate ratio, and the
    exact interpolated median length. One scan: the duplicate flag is
    a count over the text-hash partition (the exact-dedup shuffle key,
    so the plan scales like dedup_exact), then a single group-by.
    100 TB shape: shuffle on md5(text) then on (lang, source) — both
    hash-partitioned, no window over an unpartitioned frame, exact
    `percentile` is a distributed sort-based aggregate."""
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.col("text")))
    scored = d.select(
        "lang", "source", "n_chars",
        text.token_count(F.col("text")).alias("toks"),
        (
            F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", ""))
            / F.length(F.col("text"))
        ).alias("alpha"),
        F.count(F.lit(1)).over(w).alias("copies"),
    )
    return scored.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("alpha"), 4).alias("avg_alpha_ratio"),
        F.round(
            F.sum(F.when(F.col("copies") > 1, 1).otherwise(0))
            / F.count(F.lit(1)),
            4,
        ).alias("dup_ratio"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 1).alias("median_chars"),
    ).orderBy("lang", "source")


_EPOCH_RECIPE = {"src0": 2.5, "src1": 1.0, "src2": 0.25}


@query(
    "pipe_epoch_oversample",
    oracle=f"""
    WITH cfg(source, ep) AS (
        SELECT * FROM (VALUES ('src0', 2.5), ('src1', 1.0),
                              ('src2', 0.25)) t
    ), d AS (
        SELECT doc_id, documents.source, ep
        FROM documents JOIN cfg ON cfg.source = documents.source
    ), n AS (
        SELECT doc_id, source,
               CAST(floor(ep) AS INT)
               + CASE WHEN ({pipeline.portable_hash_sql('doc_id')})
                        < CAST(floor((ep - floor(ep)) * 2147483647.0)
                               AS BIGINT)
                      THEN 1 ELSE 0 END AS nc
        FROM d
    ), x AS (
        SELECT doc_id, source, CAST(u.e AS INT) AS epoch
        FROM n, unnest(range(1, nc + 1)) AS u(e)
        WHERE nc > 0
    )
    SELECT source, epoch,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM x GROUP BY source, epoch ORDER BY source, epoch
    """,
)
def pipe_epoch_oversample(spark, sf_dir):
    """Deterministic multi-epoch oversampling (operators/pipeline.py
    epoch_oversample): the "2.5 epochs of src0, 1 of src1, 0.25 of
    src2, drop the rest" recipe primitive of LLM data mixtures —
    whole epochs replicate every doc, the fractional epoch is the
    portable-hash fraction of docs, all map-side (no shuffle before
    the reporting aggregate). The oracle replays the hash pick and
    the replication with a lateral range."""
    d = T(spark, sf_dir, "documents")
    out = pipeline.epoch_oversample(d, "source", "doc_id", _EPOCH_RECIPE)
    return (
        out.groupBy("source", "epoch")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source", "epoch")
    )


_MIX_BUDGETS = {"src0": 700, "src1": 400, "src2": 100000, "src3": 1}


@query(
    "pipe_mix_token_budget",
    oracle="""
    WITH kept AS (
    """ + pipeline.mix_token_budget_sql(
        "source", "doc_id",
        r"len(string_split_regex(trim(text), '\s+'))",
        _MIX_BUDGETS,
    ) + """
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
               AS kept_tokens,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM kept GROUP BY source ORDER BY source
    """,
)
def pipe_mix_token_budget(spark, sf_dir):
    """Token-budget data-recipe mixing (operators/pipeline.py
    mix_token_budget): src2's budget exceeds its volume (kept whole),
    src0/src1 are cut mid-source at the token boundary, src3's budget
    of 1 keeps exactly its first hash-ordered doc, and every other
    source drops out. The oracle replays the identical portable-hash
    window in DuckDB and aggregates the kept set per source."""
    d = T(spark, sf_dir, "documents").withColumn(
        "toks", text.token_count(F.col("text"))
    )
    kept = pipeline.mix_token_budget(
        d, "source", "doc_id", "toks", _MIX_BUDGETS
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").alias("kept_tokens"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    ).orderBy("source")


# ------------------------------------------- round-6 pipeline additions


@query(
    "dedup_shared_run",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id AS doc, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ), pos AS (
        SELECT doc, CAST(u.i AS INTEGER) AS pos,
               array_to_string(list_slice(t, u.i + 1, u.i + 8), ' ') AS shingle
        FROM toks, unnest(range(0, greatest(len(t) - 7, 0))) AS u(i)
    ), dist AS (
        SELECT DISTINCT doc, shingle FROM pos
    ), sizes AS (
        SELECT doc, count(*) AS n_sh FROM dist GROUP BY doc
    ), inter AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS shared_windows
        FROM dist a JOIN dist b ON a.shingle = b.shingle AND a.doc < b.doc
        GROUP BY 1, 2
    ), matched AS (
        SELECT DISTINCT p.doc AS src, q.doc AS dst, p.pos
        FROM pos p JOIN dist q ON p.shingle = q.shingle AND p.doc <> q.doc
    ), streaks AS (
        SELECT src, dst, max(run_len) AS max_streak
        FROM (
            SELECT src, dst, grp, count(*) AS run_len
            FROM (
                SELECT src, dst, pos,
                       pos - row_number() OVER (
                           PARTITION BY src, dst ORDER BY pos) AS grp
                FROM matched
            )
            GROUP BY src, dst, grp
        )
        GROUP BY src, dst
    ), sym AS (
        SELECT least(src, dst) AS doc_a, greatest(src, dst) AS doc_b,
               max(max_streak) AS streak
        FROM streaks GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b, i.shared_windows,
           s.streak + 7 AS longest_run_tokens,
           round(CAST(i.shared_windows AS DOUBLE) / least(sa.n_sh, sb.n_sh),
                 6) AS containment
    FROM inter i
    JOIN sym s ON s.doc_a = i.doc_a AND s.doc_b = i.doc_b
    JOIN sizes sa ON sa.doc = i.doc_a
    JOIN sizes sb ON sb.doc = i.doc_b
    ORDER BY i.doc_a, i.doc_b
    """,
)
def dedup_shared_run(spark, sf_dir):
    """Exact-substring near-dup pairs: verbatim shared 8-token runs with
    longest-run length and containment (operators/dedup.py
    shared_run_pairs — the distributed stand-in for suffix-array
    exact-substring dedup). Catches containment the symmetric Jaccard
    score misses: a short doc quoted inside a long one."""
    d = T(spark, sf_dir, "documents")
    return dedup.shared_run_pairs(d, "doc_id", "text", window=8).orderBy(
        "doc_a", "doc_b"
    )


def _semantic_dedup_oracle(
    n_planes: int = 6, dim: int = 64, seed: int = 7,
    threshold: float = 0.9,
) -> str:
    """Exact oracle for SemDeDup-shaped semantic dedup: the seeded
    hyperplanes are inlined, the bucket expression is shared with the
    LSH-ANN oracle, and — like sim_embedding_neardup — the only pairs
    above threshold are the planted identical copies (natural max
    cosine in the fixture ~0.51), so every surviving cosine is exactly
    1.0 on both engines."""
    planes = similarity.hyperplanes(dim, n_planes, seed)
    return f"""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id < 50
    ), cand AS (
        SELECT vec_id, v FROM base
        UNION ALL
        SELECT vec_id + 1000 AS vec_id, v FROM base
    ), bk AS (
        SELECT vec_id,
               list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn,
               {_sql_bucket(planes, 'v')} AS bucket
        FROM cand
    ), dup AS (
        SELECT hi.vec_id AS vid, min(lo.vec_id) AS dup_of,
               max(round(list_dot_product(lo.vn, hi.vn), 6)) AS max_cos
        FROM bk lo JOIN bk hi
          ON lo.bucket = hi.bucket AND lo.vec_id < hi.vec_id
        WHERE round(list_dot_product(lo.vn, hi.vn), 6) >= {threshold}
        GROUP BY hi.vec_id
    )
    SELECT c.vec_id, dup.dup_of IS NULL AS kept, dup.dup_of, dup.max_cos
    FROM cand c LEFT JOIN dup ON dup.vid = c.vec_id
    ORDER BY c.vec_id
    """


@query("sim_semantic_dedup", oracle=_semantic_dedup_oracle())
def sim_semantic_dedup(spark, sf_dir):
    """SemDeDup-shaped semantic dedup (operators/similarity.py
    semantic_dedup): LSH-bucket blocking, within-bucket cosine, drop
    rows with a lower-id neighbor above threshold. Planted exact
    copies (vec_id + 1000 of vec_id < 50) make the check non-vacuous,
    exactly as sim_embedding_neardup."""
    e = T(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") < 50).select("vec_id", "embedding")
    dup = base.select(
        (F.col("vec_id") + 1000).alias("vec_id"), F.col("embedding")
    )
    return similarity.semantic_dedup(
        base.unionByName(dup), "embedding", "vec_id",
        threshold=0.9, n_planes=6, seed=7,
        dim=len(_query_vec(spark, sf_dir)),
    ).orderBy("vec_id")


def _quality_classifier_oracle(
    n_buckets: int = 64, seed: int = 9, bias: float = 0.05,
) -> str:
    """Exact oracle for the hashed-linear quality classifier: the
    seeded weight table is inlined (CAST to DOUBLE[] — the 9-dp decimal
    literals convert exactly), the portable token hash is replayed via
    portable_token_hash_sql, and list_reduce reproduces Spark
    aggregate's left-fold summation order bit for bit."""
    w = text.classifier_weights(n_buckets, seed)
    warr = "CAST([" + ", ".join(repr(v) for v in w) + "] AS DOUBLE[])"
    h = dedup.portable_token_hash_sql("t", seed)
    return rf"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        FROM documents
    ), scored AS (
        SELECT doc_id, len(tk) AS n_tokens,
               round({bias} + list_reduce(
                   list_transform(tk,
                       t -> ({warr})[CAST(({h}) % {n_buckets} AS INTEGER) + 1]),
                   (a, b) -> a + b) / len(tk), 6) AS quality_logit
        FROM toks
    )
    SELECT doc_id, n_tokens, quality_logit,
           quality_logit >= 0 AS quality_label
    FROM scored ORDER BY doc_id
    """


@query("text_quality_classifier", oracle=_quality_classifier_oracle())
def text_quality_classifier(spark, sf_dir):
    """Model-based document quality scoring (operators/text.py
    quality_classifier_score): hashed-bag-of-words linear classifier —
    the fastText/CCNet pretraining-filter pattern — as one map-side JVM
    expression per row."""
    d = T(spark, sf_dir, "documents")
    return text.quality_classifier_score(
        d, "text", "doc_id", n_buckets=64, seed=9, bias=0.05
    ).orderBy("doc_id")


@query(
    "text_lm_perplexity",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents
    ), big AS (
        SELECT doc_id,
               t[CAST(u.i AS INTEGER)] AS w1,
               t[CAST(u.i AS INTEGER) + 1] AS w2
        FROM toks, unnest(range(1, len(t))) AS u(i)
    ), c2 AS (
        SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1, 2
    ), c1 AS (
        SELECT w1, count(*) AS c1 FROM big GROUP BY 1
    ), v AS (
        SELECT count(DISTINCT tok) AS v
        FROM (SELECT unnest(t) AS tok FROM toks)
    ), scored AS (
        SELECT b.doc_id, count(*) AS n_bigrams,
               sum(ln(CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + v.v))) AS sll
        FROM big b
        JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
        JOIN c1 ON c1.w1 = b.w1
        CROSS JOIN v
        GROUP BY b.doc_id
    )
    SELECT d.doc_id,
           coalesce(s.n_bigrams, 0) AS n_bigrams,
           round(s.sll / s.n_bigrams, 6) AS avg_logprob,
           round(exp(-(s.sll / s.n_bigrams)), 4) AS ppl
    FROM toks d LEFT JOIN scored s ON s.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
)
def text_lm_perplexity(spark, sf_dir):
    """Bigram-LM perplexity per document (operators/text.py
    lm_perplexity_score): add-one-smoothed counts trained on the corpus
    itself — the CCNet/KenLM perplexity-filter pattern with a
    deterministic stand-in LM."""
    d = T(spark, sf_dir, "documents")
    return text.lm_perplexity_score(d, "text", "doc_id").orderBy("doc_id")


def _model_filter_chain_oracle(
    n_buckets: int = 64, seed: int = 9, bias: float = 0.05,
    ppl_cut: float = 31.0, window: int = 8, cont: float = 0.8,
) -> str:
    """One recursive-CTE-free DuckDB statement replaying the whole
    model-based curation chain: classifier gate -> self-trained bigram
    perplexity band -> shared-run containment dedup. Stage formulas are
    the same as the individually-oracled catalog queries; composing
    them in one statement proves stage composition, exactly as
    pipe_end_to_end_corpus does for the heuristic chain."""
    w = text.classifier_weights(n_buckets, seed)
    warr = "CAST([" + ", ".join(repr(v) for v in w) + "] AS DOUBLE[])"
    h = dedup.portable_token_hash_sql("t", seed)
    return rf"""
    WITH cls AS (
        SELECT doc_id, text,
               round({bias} + list_reduce(list_transform(
                   string_split_regex(trim(text), '\s+'),
                   t -> ({warr})[CAST(({h}) % {n_buckets} AS INTEGER) + 1]),
                   (a, b) -> a + b)
                 / len(string_split_regex(trim(text), '\s+')), 6) AS logit
        FROM documents
    ), kept1 AS (
        SELECT doc_id, text FROM cls WHERE logit >= 0
    ), ptoks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM kept1
    ), big AS (
        SELECT doc_id, t[CAST(u.i AS INTEGER)] AS w1,
               t[CAST(u.i AS INTEGER) + 1] AS w2
        FROM ptoks, unnest(range(1, len(t))) AS u(i)
    ), c2 AS (
        SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1, 2
    ), c1 AS (
        SELECT w1, count(*) AS c1 FROM big GROUP BY 1
    ), v AS (
        SELECT count(DISTINCT tok) AS v
        FROM (SELECT unnest(t) AS tok FROM ptoks)
    ), sc AS (
        SELECT b.doc_id, count(*) AS nb,
               sum(ln(CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + v.v))) AS sll
        FROM big b
        JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
        JOIN c1 ON c1.w1 = b.w1
        CROSS JOIN v
        GROUP BY b.doc_id
    ), ppl AS (
        SELECT doc_id, round(exp(-(sll / nb)), 4) AS ppl FROM sc
    ), kept2 AS (
        SELECT k.doc_id, k.text
        FROM kept1 k LEFT JOIN ppl p ON p.doc_id = k.doc_id
        WHERE p.ppl IS NULL OR p.ppl <= {ppl_cut}
    ), toks2 AS (
        SELECT doc_id AS doc, string_split_regex(trim(text), '\s+') AS t
        FROM kept2
    ), pos AS (
        SELECT doc,
               array_to_string(
                   list_slice(t, u.i + 1, u.i + {window}), ' ') AS shingle
        FROM toks2,
             unnest(range(0, greatest(len(t) - {window - 1}, 0))) AS u(i)
    ), dist AS (
        SELECT DISTINCT doc, shingle FROM pos
    ), sizes AS (
        SELECT doc, count(*) AS n_sh FROM dist GROUP BY doc
    ), inter AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS shared
        FROM dist a JOIN dist b
          ON a.shingle = b.shingle AND a.doc < b.doc
        GROUP BY 1, 2
    ), drops AS (
        SELECT DISTINCT doc_b FROM inter
        JOIN sizes sa ON sa.doc = doc_a
        JOIN sizes sb ON sb.doc = doc_b
        WHERE round(CAST(shared AS DOUBLE) / least(sa.n_sh, sb.n_sh), 6)
              >= {cont}
    )
    SELECT k.doc_id,
           len(string_split_regex(trim(k.text), '\s+')) AS tokens,
           md5(k.text) AS text_hash
    FROM kept2 k LEFT JOIN drops dr ON dr.doc_b = k.doc_id
    WHERE dr.doc_b IS NULL
    ORDER BY k.doc_id
    """


@query("pipe_model_filter_chain", oracle=_model_filter_chain_oracle())
def pipe_model_filter_chain(spark, sf_dir):
    """Model-based curation chain, composed end to end: hashed-linear
    quality-classifier gate (logit >= 0) -> bigram-LM perplexity band
    trained on the survivors themselves (ppl <= 31, no-bigram docs
    pass) -> shared-run containment dedup (drop the higher-id doc of
    any pair with containment >= 0.8). Each kernel is individually
    oracled above; this proves their composition as ONE dataflow. At
    100 TB: stage 1 is scan-level codegen, stage 2 two count shuffles
    plus co-partitioned joins, stage 3 the shared-window blocking join
    — no stage collects to the driver."""
    d = T(spark, sf_dir, "documents")
    scored = text.quality_classifier_score(d)
    # checkpoint: kept1 feeds the LM's bigrams, its vocabulary scan,
    # and the final projection — one materialization, not three scans
    kept1 = (
        d.join(
            scored.filter(F.col("quality_label")).select("doc_id"),
            "doc_id",
        )
        .select("doc_id", "text")
        .localCheckpoint(eager=False)
    )
    ppl = text.lm_perplexity_score(kept1)
    kept2 = kept1.join(
        ppl.filter(
            F.col("ppl").isNull() | (F.col("ppl") <= 31.0)
        ).select("doc_id"),
        "doc_id",
    ).localCheckpoint(eager=False)
    drops = (
        dedup.shared_run_pairs(kept2, "doc_id", "text", window=8)
        .filter(F.col("containment") >= 0.8)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return (
        kept2.join(drops, "doc_id", "left_anti")
        .select(
            "doc_id",
            text.token_count(F.col("text")).alias("tokens"),
            F.md5("text").alias("text_hash"),
        )
        .orderBy("doc_id")
    )


@query("sim_semantic_dedup_kmeans")  # KMeans-trained clusters -> rows-only
def sim_semantic_dedup_kmeans(spark, sf_dir):
    """SemDeDup with real k-means clusters (operators/similarity.py
    semantic_dedup_kmeans) — the paper's data-adaptive form; the
    seeded-LSH variant above is its exactly-oracled twin. Iterative
    MLlib training -> rows-only driver check;
    `sim_semantic_kmeans_invariants` pins the contract exactly."""
    e = T(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") < 50).select("vec_id", "embedding")
    dup = base.select(
        (F.col("vec_id") + 1000).alias("vec_id"), F.col("embedding")
    )
    return similarity.semantic_dedup_kmeans(
        base.unionByName(dup), "embedding", "vec_id",
        threshold=0.9, n_lists=4,
    ).orderBy("vec_id")


def _dsir_oracle(n_buckets: int = 256, seed: int = 11) -> str:
    """Exact oracle for DSIR importance selection: hashed-unigram
    bucket histograms for target (lang = 'en') and raw corpora,
    Laplace-smoothed ratio, per-doc mean log ratio. Double arithmetic
    is forced with e-notation literals so DuckDB never falls into
    exact DECIMAL division (Spark computes doubles)."""
    h = dedup.portable_token_hash_sql("t", seed)
    b = f"CAST(({h}) % {n_buckets} AS INTEGER)"
    return rf"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        FROM documents
    ), tb AS (
        SELECT doc_id, {b} AS b FROM tok
    ), ttok AS (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS t
        FROM documents WHERE lang = 'en'
    ), ttb AS (
        SELECT {b} AS b FROM ttok
    ), th AS (
        SELECT b, count(*) AS tc FROM ttb GROUP BY b
    ), rh AS (
        SELECT b, count(*) AS rc FROM tb GROUP BY b
    ), tt AS (
        SELECT count(*) AS tn FROM ttb
    ), rt AS (
        SELECT count(*) AS rn FROM tb
    ), scored AS (
        SELECT tb.doc_id, count(*) AS n_tokens,
               round(sum(ln(
                   ((coalesce(th.tc, 0) + 1.0e0) / (tt.tn + {n_buckets}.0e0))
                   / ((coalesce(rh.rc, 0) + 1.0e0) / (rt.rn + {n_buckets}.0e0))
               )) / count(*), 6) AS avg_log_ratio
        FROM tb
        LEFT JOIN th ON th.b = tb.b
        LEFT JOIN rh ON rh.b = tb.b
        CROSS JOIN tt CROSS JOIN rt
        GROUP BY tb.doc_id
    )
    SELECT doc_id, n_tokens, avg_log_ratio,
           avg_log_ratio >= 0 AS selected
    FROM scored ORDER BY doc_id
    """


@query("pipe_dsir_select", oracle=_dsir_oracle())
def pipe_dsir_select(spark, sf_dir):
    """DSIR-style target-domain data selection (operators/pipeline.py
    dsir_importance): score every document by the mean log importance
    ratio of its hashed unigrams against the lang='en' target slice;
    `selected` keeps docs more target-like than raw-like."""
    d = T(spark, sf_dir, "documents")
    return pipeline.dsir_importance(
        d, d.filter(F.col("lang") == "en"), "text", "doc_id",
        n_buckets=256, seed=11,
    ).orderBy("doc_id")


@query(
    "dedup_span_rewrite",
    oracle=r"""
    WITH base AS (
        SELECT doc_id AS doc, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ), occ AS (
        SELECT doc, CAST(u.i AS INTEGER) AS wpos,
               array_to_string(list_slice(t, u.i + 1, u.i + 8), ' ') AS gram
        FROM base, unnest(range(0, greatest(len(t) - 7, 0))) AS u(i)
    ), marked AS (
        SELECT doc, wpos,
               count(*) OVER (PARTITION BY gram) AS cnt,
               row_number() OVER (
                   PARTITION BY gram ORDER BY doc, wpos) AS rn
        FROM occ
    ), covered AS (
        SELECT DISTINCT doc, wpos + CAST(u.j AS INTEGER) AS pos
        FROM marked, unnest(range(0, 8)) AS u(j)
        WHERE cnt > 1 AND rn > 1
    ), toks AS (
        SELECT doc, unnest(t) AS tok,
               CAST(unnest(range(len(t))) AS INTEGER) AS pos
        FROM base
    ), kept AS (
        SELECT k.doc, k.tok, k.pos
        FROM toks k ANTI JOIN covered c
          ON c.doc = k.doc AND c.pos = k.pos
    ), agg AS (
        SELECT doc, count(*) AS n_tokens,
               string_agg(tok, ' ' ORDER BY pos) AS clean_text
        FROM kept GROUP BY doc
    )
    SELECT b.doc AS doc_id,
           coalesce(a.clean_text, '') AS clean_text,
           CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(len(b.t) - coalesce(a.n_tokens, 0) AS BIGINT) AS n_removed
    FROM base b LEFT JOIN agg a ON a.doc = b.doc
    ORDER BY doc_id
    """,
)
def dedup_span_rewrite(spark, sf_dir):
    """Duplicated-span REMOVAL rewrite (operators/dedup.py
    remove_duplicate_spans): every token covered by an 8-token run
    whose text occurs more than once in the corpus is deleted except
    in the run's first (min (doc, pos)) occurrence — the ExactSubstr
    dedup of Lee et al. 2022 applied as a corpus edit, where
    `dedup_shared_run` only reports the pairs. Returns the cleaned
    corpus: one row per document with the surviving text and the
    removed-token count. No occurrence-pair join anywhere — a gram
    duplicated k times costs O(k·8) rows, never O(k²)."""
    d = T(spark, sf_dir, "documents")
    # ordered=True: the operator range-partitions its output on the doc
    # id, so this global ORDER BY sorts within partitions without
    # sampling (re-executing) the reassembly projection (r13).
    return dedup.remove_duplicate_spans(
        d, "doc_id", "text", window=8, ordered=True
    ).orderBy("doc_id")


@query(
    "dedup_boilerplate_segments",
    oracle=r"""
    WITH base AS (
        SELECT doc_id AS doc, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ), occ AS (
        SELECT doc, CAST(u.i AS INTEGER) AS spos,
               array_to_string(
                   list_slice(t, u.i * 6 + 1, u.i * 6 + 6), ' ') AS seg
        FROM base,
             unnest(range(0, CAST(ceil(len(t) / 6.0e0) AS BIGINT))) AS u(i)
    ), boiler AS (
        SELECT seg FROM occ GROUP BY seg
        HAVING count(DISTINCT doc) >= 3
    ), kept AS (
        SELECT o.doc, o.spos, o.seg
        FROM occ o ANTI JOIN boiler b ON b.seg = o.seg
    ), agg AS (
        SELECT doc, count(*) AS n_kept,
               string_agg(seg, ' ' ORDER BY spos) AS clean_text
        FROM kept GROUP BY doc
    )
    SELECT b.doc AS doc_id,
           coalesce(a.clean_text, '') AS clean_text,
           CAST(CASE WHEN coalesce(a.clean_text, '') = '' THEN 0
                ELSE len(string_split_regex(a.clean_text, '\s+'))
                END AS BIGINT) AS n_tokens,
           CAST(CAST(ceil(len(b.t) / 6.0e0) AS BIGINT)
                - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed_segments
    FROM base b LEFT JOIN agg a ON a.doc = b.doc
    ORDER BY doc_id
    """,
)
def dedup_boilerplate_segments(spark, sf_dir):
    """Boilerplate-segment removal (operators/dedup.py
    remove_boilerplate_segments): disjoint 6-token segments appearing
    in >= 3 distinct documents are deleted from EVERY document — the
    CCNet/RefinedWeb repeated-paragraph pass, complementing
    `dedup_span_rewrite` (which keeps first occurrences and triggers
    on any re-occurrence). At sf0.01 this strips 105 occurrences of 28
    boilerplate segments across 68 of the 500 docs. The oracle replays
    the identical disjoint segmentation with DuckDB list slices."""
    d = T(spark, sf_dir, "documents")
    return dedup.remove_boilerplate_segments(
        d, "doc_id", "text", seg=6, min_docs=3
    ).orderBy("doc_id")


# The fixture's sources are uniform-sized, which would degenerate every
# temperature rate to the same value; this deterministic skew (sources
# src2..src9 lose their upper id half) makes the alpha < 1 up-sampling
# observable. An id-modulus predicate would NOT work: doc_id is assigned
# round-robin, so doc_id % k is constant within a source.
_SKEW_PRED = "doc_id < 250 OR source < 'src2'"


@query(
    "pipe_mix_temperature",
    oracle="""
    WITH kept AS (
    """ + pipeline.mix_temperature_sql(
        "source", "doc_id", alpha=0.5, target_fraction=0.5,
        table=f"(SELECT * FROM documents WHERE {_SKEW_PRED})",
    ) + """
    )
    SELECT source, mix_rate AS rate, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM kept GROUP BY source, mix_rate ORDER BY source
    """,
)
def pipe_mix_temperature(spark, sf_dir):
    """Temperature-scaled source mixing (operators/pipeline.py
    mix_temperature): keep rates q_s ∝ n_s^0.5 normalized to a 50%
    row target — alpha < 1 up-samples small sources relative to their
    natural share (the multilingual-pretraining mixing rule), made
    observable by deterministically halving 8 of the 20 fixture
    sources on both sides. Rates are 6dp-rounded before the hash cut
    on BOTH engines so the boundary is reproducible; the corpus is
    never shuffled — one tiny count aggregate, a broadcast rate join,
    one codegen'd filter."""
    d = T(spark, sf_dir, "documents").filter(F.expr(_SKEW_PRED))
    kept = pipeline.mix_temperature(
        d, "source", "doc_id", alpha=0.5, target_fraction=0.5
    )
    return kept.groupBy("source", F.col("mix_rate").alias("rate")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    ).orderBy("source")


@query(
    "text_ngram_vocab",
    oracle=r"""
    WITH b AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ), g AS (
        SELECT doc_id,
               array_to_string(list_slice(t, u.i + 1, u.i + 2), ' ') AS gram
        FROM b, unnest(range(0, greatest(len(t) - 1, 0))) AS u(i)
    )
    SELECT gram, count(*) AS occurrences,
           count(DISTINCT doc_id) AS doc_freq
    FROM g GROUP BY gram
    ORDER BY occurrences DESC, gram ASC LIMIT 25
    """,
)
def text_ngram_vocab(spark, sf_dir):
    """Corpus bigram vocabulary head (operators/text.py ngram_vocab):
    the 25 most frequent word bigrams with occurrence and document
    frequencies — the Zipf-head report a corpus build inspects before
    tokenizer training. Deterministic (count desc, gram asc) tiebreak;
    one gram-keyed shuffle + TakeOrdered, the sorted vocabulary is
    never materialized."""
    d = T(spark, sf_dir, "documents")
    return text.ngram_vocab(d, "doc_id", "text", n=2, top_k=25)


@query(
    "text_tfidf_topterms",
    oracle=r"""
    WITH tf AS (
        SELECT doc_id, t.term, count(*) AS tf
        FROM (
            SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\s+')) AS term
            FROM documents
        ) t
        GROUP BY doc_id, t.term
    ), dfreq AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (
        SELECT count(DISTINCT doc_id) AS n FROM documents
    ), scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
               round(tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df), 6)
                   AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ), ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY score DESC, term ASC) AS term_rank
        FROM scored
    )
    SELECT doc_id, term, tf, df, score, term_rank
    FROM ranked WHERE term_rank <= 3 AND doc_id < 100
    ORDER BY doc_id, term_rank
    """,
)
def text_tfidf_topterms(spark, sf_dir):
    """Per-document tf-idf keyword extraction (operators/text.py
    tfidf_top_terms): top-3 terms by tf·ln(N/df), scores 6dp-rounded
    BEFORE ranking so the (score desc, term asc) order reproduces
    across engines; idf statistics come from the full corpus, the
    reported slice is doc_id < 100."""
    d = T(spark, sf_dir, "documents")
    out = text.tfidf_top_terms(d, "doc_id", "text", top_k=3)
    return out.filter(F.col("doc_id") < 100).orderBy("doc_id", "term_rank")


@query(
    "pipe_source_overlap",
    oracle=r"""
    WITH b AS (
        SELECT source, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ), dist AS (
        SELECT DISTINCT source AS grp,
               array_to_string(list_slice(t, u.i + 1, u.i + 3), ' ')
                   AS shingle
        FROM b, unnest(range(0, greatest(len(t) - 2, 0))) AS u(i)
    ), sizes AS (
        SELECT grp, count(*) AS n_sh FROM dist GROUP BY grp
    ), inter AS (
        SELECT a.grp AS group_a, b.grp AS group_b,
               count(*) AS shared_shingles
        FROM dist a JOIN dist b
          ON a.shingle = b.shingle AND a.grp < b.grp
        GROUP BY 1, 2
    )
    SELECT i.group_a, i.group_b, i.shared_shingles,
           sa.n_sh AS n_a, sb.n_sh AS n_b,
           round(CAST(i.shared_shingles AS DOUBLE)
                 / (sa.n_sh + sb.n_sh - i.shared_shingles), 6) AS jaccard,
           round(CAST(i.shared_shingles AS DOUBLE)
                 / least(sa.n_sh, sb.n_sh), 6) AS containment
    FROM inter i
    JOIN sizes sa ON sa.grp = i.group_a
    JOIN sizes sb ON sb.grp = i.group_b
    ORDER BY i.group_a, i.group_b
    """,
)
def pipe_source_overlap(spark, sf_dir):
    """Cross-source content-overlap matrix (operators/dedup.py
    group_shingle_overlap): exact 3-gram shingle-set intersection,
    Jaccard, and containment for every source pair sharing content —
    the cross-dump leakage report of a web-corpus build. Blocking is
    the shingle equi-join (never all-pairs over rows); the pair
    aggregate is bounded by the source count."""
    d = T(spark, sf_dir, "documents")
    return dedup.group_shingle_overlap(d, "source", "text", n=3).orderBy(
        "group_a", "group_b"
    )


@query(
    "text_bpe_first_merge",
    oracle=r"""
    WITH w AS (
        SELECT t.word, count(*) AS freq
        FROM (
            SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
            FROM documents
        ) t GROUP BY t.word
    ), s AS (
        SELECT list_append(string_split_regex(word, ''), '</w>')
                   AS symbols, freq
        FROM w
    ), p AS (
        SELECT symbols[u.i + 1] AS left, symbols[u.i + 2] AS right, freq
        FROM s, unnest(range(0, len(symbols) - 1)) AS u(i)
    )
    SELECT "left", "right", CAST(sum(freq) AS BIGINT) AS pair_count
    FROM p GROUP BY 1, 2
    ORDER BY pair_count DESC, "left" ASC, "right" ASC
    LIMIT 5
    """,
)
def text_bpe_first_merge(spark, sf_dir):
    """The first BPE training round, exactly (operators/text.py
    bpe_pair_counts): top-5 adjacent initial-symbol pairs over the
    corpus word-type table with end-of-word markers — the
    SQL-expressible contract for the iterative `text_bpe_train`
    (its first merge must equal this head's top row)."""
    d = T(spark, sf_dir, "documents")
    return text.bpe_pair_counts(d, "text", top_k=5)


@query("text_bpe_train")  # iterative greedy merges — no SQL oracle
def text_bpe_train(spark, sf_dir):
    """Distributed BPE tokenizer training (operators/text.py
    bpe_train, Sennrich et al. 2016): 8 greedy merges over the corpus
    word-type table, each round one pair-count shuffle bounded by
    vocabulary size + a 1-row argmax + a JVM fold applying the merge.
    Inherently iterative → rows-only driver check; the first round is
    oracle-pinned by `text_bpe_first_merge` and the full greedy
    sequence by the worked-example unit test."""
    d = T(spark, sf_dir, "documents")
    return text.bpe_train(d, "text", n_merges=8).orderBy("step")


@query(
    "text_heavy_hitters",
    oracle=r"""
    WITH tok AS (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        FROM documents
    ), cnt AS (
        SELECT token, CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY token
    ), top AS (
        SELECT token, cnt,
               CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT)
                   AS rank
        FROM cnt ORDER BY cnt DESC, token LIMIT 20
    ), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok)
    SELECT token, cnt, rank,
           (SELECT min(cnt) FROM top)
               > (SELECT n FROM tot) / CAST(81 AS DOUBLE) AS certified
    FROM top ORDER BY rank
    """,
)
def text_heavy_hitters(spark, sf_dir):
    """Exact corpus top-20 tokens via the two-pass heavy-hitters plan
    (operators/text.py heavy_hitters): per-partition Misra-Gries
    candidate summaries, broadcast semi-join, exact recount of
    candidates only, and the N/(cap+1) exactness certificate — the
    full vocabulary never shuffles. The oracle computes the exact
    top-20 directly (identical tiebreak) plus the same certificate,
    so a hash match proves both the answer and the certificate
    algebra."""
    d = T(spark, sf_dir, "documents")
    return text.heavy_hitters(d, "text", k=20, candidate_factor=4)


@query(
    "text_bpe_encode_contract",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents
    ), enc AS (
        SELECT doc_id, w,
               len(w) + 1
                 - (len(w) - len(replace(w, 'ta', '|'))) AS n_sub
        FROM tok
    )
    SELECT doc_id,
           count(*) AS n_words,
           CAST(sum(n_sub) AS BIGINT) AS n_subwords,
           floor(count(*) * 1.0e4 / sum(n_sub) + 0.5) / 1.0e4
               AS compression
    FROM enc GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_bpe_encode_contract(spark, sf_dir):
    """BPE encoding APPLICATION contract, exactly (operators/text.py
    bpe_encode_docs): one fixed literal merge ('t','a') applied to
    every corpus word — per-doc subword counts. With a single merge of
    distinct symbols the greedy fold's application count equals the
    non-overlapping substring count of 'ta', which DuckDB replays as a
    sentinel replace + length delta: n_subwords(word) = len+1 - apps.
    `text_bpe_first_merge` pins the trainer's argmax; this pins the
    encoder's merge application; `text_bpe_encode` runs the full
    trained loop (rows-only) and `text_bpe_encode_invariants` holds
    its algebraic contracts."""
    d = T(spark, sf_dir, "documents")
    return text.bpe_encode_docs(
        d, "doc_id", "text", merges=[("t", "a")]
    ).orderBy("doc_id")


@query("text_bpe_encode")  # trained-merge loop is iterative — rows-only
def text_bpe_encode(spark, sf_dir):
    """The full tokenizer loop: train 8 BPE merges on the corpus
    (text_bpe_train), then ENCODE the corpus under them
    (operators/text.py bpe_encode_docs) — per-doc word/subword counts
    and compression. The merge table is the model artifact (an O(8)
    sanctioned collect); encoding itself is one codegen'd fold chain
    over the word-TYPE table + a broadcast decorate join, never a
    per-merge corpus pass. Trainer is iterative → rows-only; the
    application semantics are oracle-pinned by
    `text_bpe_encode_contract` and the invariants companion."""
    d = T(spark, sf_dir, "documents")
    merge_rows = text.bpe_train(d, "text", n_merges=8).collect()
    merges = [(r["left"], r["right"]) for r in merge_rows]
    return text.bpe_encode_docs(
        d, "doc_id", "text", merges=merges
    ).orderBy("doc_id")


@query(
    "text_bpe_encode_invariants",
    oracle="""
    SELECT true AS reconstructs, true AS symbols_in_vocab,
           true AS bounds_hold, true AS marker_terminated
    """,
)
def text_bpe_encode_invariants(spark, sf_dir):
    """Driver-checked algebraic contracts of the trained BPE encode
    (the rows-only `text_bpe_encode`'s exact companion): (1) the
    symbol sequence of every word type concatenates back to
    word || '</w>' — merging never loses or reorders characters;
    (2) every emitted symbol is a single character, the end marker, or
    one of the learned merge strings — nothing else can be produced;
    (3) 1 <= n_subwords <= len(word) + 1; (4) the last symbol always
    carries the end-of-word marker."""
    d = T(spark, sf_dir, "documents")
    merge_rows = text.bpe_train(d, "text", n_merges=8).collect()
    merges = [(r["left"], r["right"]) for r in merge_rows]
    vocab = [left + right for left, right in merges]
    enc = text.bpe_encode_words(d, "text", merges)
    in_vocab = F.forall(
        "symbols",
        lambda s: (F.length(s) == 1)
        | (s == F.lit("</w>"))
        | s.isin(*vocab),
    )
    return enc.agg(
        F.bool_and(
            F.concat_ws("", "symbols")
            == F.concat(F.col("word"), F.lit("</w>"))
        ).alias("reconstructs"),
        F.bool_and(in_vocab).alias("symbols_in_vocab"),
        F.bool_and(
            (F.col("n_subwords") >= 1)
            & (F.col("n_subwords") <= F.length("word") + 1)
        ).alias("bounds_hold"),
        F.bool_and(
            F.element_at("symbols", -1).endswith("</w>")
        ).alias("marker_terminated"),
    )


@query(
    "pipe_shard_assign",
    oracle=f"""
    WITH a AS (
        SELECT doc_id, ({pipeline.portable_hash_sql('doc_id')}) AS h
        FROM documents
    ), s AS (
        SELECT doc_id, h,
               CAST(h % 8 AS INTEGER) AS shard,
               row_number() OVER (
                   PARTITION BY h % 8 ORDER BY h ASC, doc_id ASC
               ) - 1 AS pos
        FROM a
    )
    SELECT doc_id, shard, CAST(pos AS INTEGER) AS pos
    FROM s WHERE doc_id < 100 ORDER BY doc_id
    """,
)
def pipe_shard_assign(spark, sf_dir):
    """Deterministic output sharding (operators/pipeline.py
    shard_assign): portable-hash shard membership + within-shard
    (hash, id) rank — the training-data loader layout. No global
    ordering anywhere (a corpus-wide row_number would serialize); the
    position window partitions by shard. Reported slice: doc_id < 100
    of the full assignment."""
    d = T(spark, sf_dir, "documents")
    out = pipeline.shard_assign(d, "doc_id", n_shards=8)
    return (
        out.filter(F.col("doc_id") < 100)
        .select("doc_id", "shard", F.col("pos").cast("int").alias("pos"))
        .orderBy("doc_id")
    )


@query(
    "sim_label_centroids",
    oracle="""
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ), d AS (
        SELECT label, CAST(u.i AS INTEGER) AS pos, v[u.i + 1] AS val
        FROM e, unnest(range(len(v))) AS u(i)
    ), c AS (
        SELECT label, pos, round(sum(val) / count(*), 9) AS m
        FROM d GROUP BY 1, 2
    ), cent AS (
        SELECT label, list(m ORDER BY pos) AS cv FROM c GROUP BY label
    ), j AS (
        SELECT e.label,
               round(list_dot_product(e.v, cent.cv)
                     / (sqrt(list_dot_product(e.v, e.v))
                        * sqrt(list_dot_product(cent.cv, cent.cv))),
                     6) AS cos,
               sqrt(list_dot_product(cent.cv, cent.cv)) AS cnorm
        FROM e JOIN cent USING (label)
    )
    SELECT label, count(*) AS n_vecs,
           floor(any_value(cnorm) * 1e4 + 0.5) / 1e4 AS centroid_norm,
           floor(avg(cos) * 1e4 + 0.5) / 1e4 AS avg_cos,
           min(cos) AS min_cos
    FROM j GROUP BY label ORDER BY label
    """,
)
def sim_label_centroids(spark, sf_dir):
    """Per-label embedding centroid QA (operators/similarity.py
    label_centroids): centroid norm, member count, mean/min member
    cosine to the centroid — the class-coherence report of a labeled
    embedding set. Centroids aggregate on the balanced (label, dim)
    key (never a per-label fold on one partition) and broadcast back
    for the member-cosine pass."""
    e = T(spark, sf_dir, "embeddings")
    return similarity.label_centroids(e, "embedding", "label", "vec_id")


@query(
    "text_gopher_filter",
    oracle=r"""
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
        FROM documents
    ), f AS (
        SELECT doc_id,
               len(words) AS n_tokens,
               round(list_sum(list_transform(words, x -> len(x))) * 1.0
                     / len(words), 4) AS avg_word_len,
               round(list_max(list_transform(list_distinct(words),
                         x -> len(list_filter(words, y -> y = x)))) * 1.0
                     / len(words), 4) AS r_top_word,
               round(len(list_distinct(words)) * 1.0 / len(words), 4)
                   AS r_distinct
        FROM w
    ), r AS (
        SELECT *,
               n_tokens >= 25 AND n_tokens <= 90 AS ok_len,
               avg_word_len >= 3.0 AND avg_word_len <= 10.0
                   AS ok_word_len,
               r_top_word <= 0.12 AS ok_top_word,
               r_distinct >= 0.35 AS ok_distinct
        FROM f
    )
    SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens, avg_word_len,
           r_top_word, r_distinct, ok_len, ok_word_len, ok_top_word,
           ok_distinct,
           ok_len AND ok_word_len AND ok_top_word AND ok_distinct
               AS kept
    FROM r ORDER BY doc_id
    """,
)
def text_gopher_filter(spark, sf_dir):
    """Gopher-rule composite filter (operators/text.py gopher_filter,
    Rae et al. 2021 §A1.1): per-document keep/drop with one boolean
    per rule — length band 25..90, mean word length 3..10, top-word
    repetition <= 0.12, distinct-token ratio >= 0.35 (thresholds set
    so the fixture splits non-vacuously). Ratios 4dp-rounded before
    the compare on both engines; one map-side pass, no shuffle."""
    d = T(spark, sf_dir, "documents")
    out = text.gopher_filter(
        d, "text", "doc_id",
        min_tokens=25, max_tokens=90,
        min_avg_word_len=3.0, max_avg_word_len=10.0,
        max_top_word=0.12, min_distinct=0.35,
    )
    return out.withColumn(
        "n_tokens", F.col("n_tokens").cast("int")
    ).orderBy("doc_id")


def _curation_v2_oracle() -> str:
    """Single-statement DuckDB replay of the v2 curation chain:
    Gopher-rule filter → duplicated-span rewrite over the kept set →
    temperature mixing over the rewritten corpus → shard membership.
    Each stage reuses the standalone oracle's formulas verbatim."""
    mix = pipeline.mix_temperature_sql(
        "source", "doc_id", alpha=0.5, target_fraction=0.5,
        table="rewritten",
    )
    h = pipeline.portable_hash_sql("doc_id")
    return rf"""
    WITH g AS (
        SELECT doc_id, text, source,
               string_split_regex(trim(text), '\s+') AS words
        FROM documents
    ), kept0 AS (
        SELECT doc_id, text, source FROM g
        WHERE len(words) >= 25 AND len(words) <= 90
          AND round(list_sum(list_transform(words, x -> len(x))) * 1.0
                    / len(words), 4) BETWEEN 3.0 AND 10.0
          AND round(list_max(list_transform(list_distinct(words),
                        x -> len(list_filter(words, y -> y = x)))) * 1.0
                    / len(words), 4) <= 0.12
          AND round(len(list_distinct(words)) * 1.0 / len(words), 4)
                  >= 0.35
    ), base AS (
        SELECT doc_id AS doc, source,
               string_split_regex(trim(text), '\s+') AS t
        FROM kept0
    ), occ AS (
        SELECT doc, CAST(u.i AS INTEGER) AS wpos,
               array_to_string(list_slice(t, u.i + 1, u.i + 8), ' ')
                   AS gram
        FROM base, unnest(range(0, greatest(len(t) - 7, 0))) AS u(i)
    ), marked AS (
        SELECT doc, wpos,
               count(*) OVER (PARTITION BY gram) AS cnt,
               row_number() OVER (
                   PARTITION BY gram ORDER BY doc, wpos) AS rn
        FROM occ
    ), covered AS (
        SELECT DISTINCT doc, wpos + CAST(u.j AS INTEGER) AS pos
        FROM marked, unnest(range(0, 8)) AS u(j)
        WHERE cnt > 1 AND rn > 1
    ), toks AS (
        SELECT doc, CAST(unnest(range(len(t))) AS INTEGER) AS pos
        FROM base
    ), kept_tok AS (
        SELECT k.doc, count(*) AS n_tokens
        FROM (
            SELECT t2.doc, t2.pos FROM toks t2
            ANTI JOIN covered c ON c.doc = t2.doc AND c.pos = t2.pos
        ) k GROUP BY k.doc
    ), rewritten AS (
        SELECT b.doc AS doc_id, b.source,
               coalesce(kt.n_tokens, 0) AS n_tokens
        FROM base b LEFT JOIN kept_tok kt ON kt.doc = b.doc
    ), mixed AS (
        {mix}
    )
    SELECT CAST(({h}) % 8 AS INTEGER) AS shard,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           count(DISTINCT source) AS n_sources,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM mixed GROUP BY 1 ORDER BY shard
    """


@query("pipe_curation_v2", oracle=_curation_v2_oracle())
def pipe_curation_v2(spark, sf_dir):
    """The v2 curation chain as ONE dataflow — Gopher-rule filter →
    duplicated-span rewrite over the kept set → temperature-scaled
    source mixing of the rewritten corpus → shard membership — with a
    per-shard summary output. The composition proof for the
    end-of-r6 operator family (the model-filter counterpart is
    `pipe_model_filter_chain`): every stage's semantics are exactly
    the standalone operator's, replayed by one DuckDB statement.
    Scale: the chain inherits each stage's shape — map-side filter,
    linear span edit, broadcast rate join, map-side shard hash; the
    kept set materializes once (the span rewrite checkpoints its
    base)."""
    d = T(spark, sf_dir, "documents")
    g = text.gopher_filter(
        d, "text", "doc_id",
        min_tokens=25, max_tokens=90,
        min_avg_word_len=3.0, max_avg_word_len=10.0,
        max_top_word=0.12, min_distinct=0.35,
    ).filter(F.col("kept")).select("doc_id")
    kept_docs = d.join(g, "doc_id").select("doc_id", "text", "source")
    rw = dedup.remove_duplicate_spans(kept_docs, "doc_id", "text", 8)
    rws = rw.select("doc_id", "n_tokens").join(
        kept_docs.select("doc_id", "source"), "doc_id"
    )
    mixed = pipeline.mix_temperature(
        rws, "source", "doc_id", alpha=0.5, target_fraction=0.5
    )
    return (
        mixed.withColumn(
            "shard",
            F.pmod(
                pipeline.portable_hash(F.col("doc_id")), F.lit(8)
            ).cast("int"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("shard")
    )


# ------------------------------------------------------- BM25 retrieval

_BM25_TERMS = ("hash", "join", "vector")


@query(
    "text_bm25_topk",
    oracle=__import__(
        "heavydb_spark.operators.retrieval", fromlist=["bm25_oracle_sql"]
    ).bm25_oracle_sql(_BM25_TERMS, k=25),
)
def text_bm25_topk(spark, sf_dir):
    """Okapi BM25 ranked retrieval (operators/retrieval.py bm25_topk):
    top-25 documents for the query {hash, join, vector}, Lucene idf
    form, k1=1.2 b=0.75. Map-only per-term tfs (no explode), one
    broadcast stats row, TakeOrdered top-k — zero wide shuffle. The
    retrieval-based decontamination / quality-by-example lookup of a
    training-data pipeline."""
    from heavydb_spark.operators.retrieval import bm25_topk

    d = T(spark, sf_dir, "documents")
    return bm25_topk(d, _BM25_TERMS, k=25)


@query(
    "text_chunk_windows",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ), c AS (
        SELECT doc_id, CAST(u.i AS INT) AS chunk_idx,
               CAST(u.i * 24 AS INT) AS start_tok,
               list_slice(t, u.i * 24 + 1,
                          least(u.i * 24 + 32, len(t))) AS ctoks
        FROM tok,
             unnest(range(0, CAST(floor((len(t) - 1) / 24) AS BIGINT) + 1))
                 AS u(i)
        WHERE len(t) > 0
    )
    SELECT doc_id, chunk_idx, start_tok,
           CAST(len(ctoks) AS INT) AS n_chunk_tokens,
           md5(array_to_string(ctoks, ' ')) AS chunk_hash
    FROM c ORDER BY doc_id, chunk_idx
    """,
)
def text_chunk_windows(spark, sf_dir):
    """Overlapping token-window chunking (operators/text.py
    chunk_windows): size-32 windows at stride 24 (8-token overlap), the
    context-window splitter before tokenize-and-pack or embedding. One
    map-side pass — sequence starts, slice in a transform, posexplode —
    zero shuffle; the oracle replays the slicing with a lateral range."""
    d = T(spark, sf_dir, "documents")
    return text.chunk_windows(
        d, "doc_id", "text", size=32, stride=24
    ).orderBy("doc_id", "chunk_idx")


@query(
    "sim_hybrid_retrieval",
    oracle=__import__(
        "heavydb_spark.operators.retrieval", fromlist=["hybrid_oracle_sql"]
    ).hybrid_oracle_sql(_BM25_TERMS, m=100, k=20),
)
def sim_hybrid_retrieval(spark, sf_dir):
    """Hybrid retrieval (operators/retrieval.py hybrid_rerank): BM25
    lexical top-100 for {hash, join, vector}, re-ranked by cosine to
    vec_id 0's embedding, top-20 out. Stage 1 is the O(1)-shuffle BM25;
    stage 2 broadcasts the 100-row candidate set against the embedding
    table (never shuffles it) — the recall-then-precision lookup of
    retrieval-based decontamination at corpus scale."""
    from heavydb_spark.operators.retrieval import hybrid_rerank

    d = T(spark, sf_dir, "documents")
    e = T(spark, sf_dir, "embeddings")
    return hybrid_rerank(
        d, e, _BM25_TERMS, _query_vec(spark, sf_dir), m=100, k=20
    )


@query(
    "pipe_weighted_sample",
    oracle="""
    SELECT doc_id, source, n_chars, round(es_key, 6) + 0.0e0 AS es_key
    FROM (
    """ + pipeline.weighted_sample_sql(
        "documents", "doc_id", "n_chars", 50
    ) + """
    ) ORDER BY doc_id
    """,
)
def pipe_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement
    (operators/pipeline.py weighted_sample, Efraimidis–Spirakis):
    top-50 documents by ln(u)/n_chars with u from the portable hash —
    inclusion probability scales with length, the sample replays
    bit-identically in any engine. Map-side key + TakeOrdered top-k:
    no shuffle, no global sort."""
    d = T(spark, sf_dir, "documents")
    out = pipeline.weighted_sample(d, "doc_id", "n_chars", k=50)
    return out.select(
        "doc_id", "source", "n_chars",
        (F.round("es_key", 6) + F.lit(0.0)).alias("es_key"),
    ).orderBy("doc_id")


@query(
    "pipe_winsorize",
    oracle="""
    WITH b AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS p_lo,
               quantile_cont(value, 0.95) AS p_hi
        FROM events GROUP BY event_type
    ), c AS (
        SELECT e.event_type, e.value, b.p_lo, b.p_hi,
               least(greatest(e.value, b.p_lo), b.p_hi) AS value_w
        FROM events e JOIN b USING (event_type)
    )
    SELECT event_type,
           round(any_value(p_lo), 4) AS p_lo,
           round(any_value(p_hi), 4) AS p_hi,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN value < p_lo THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clamped_lo,
           CAST(sum(CASE WHEN value > p_hi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clamped_hi,
           round(avg(value), 4) AS mean_raw,
           round(avg(value_w), 4) AS mean_w
    FROM c GROUP BY event_type ORDER BY event_type
    """,
)
def pipe_winsorize(spark, sf_dir):
    """Per-group winsorization (operators/pipeline.py winsorize): clamp
    event values to the group's exact interpolated [p05, p95] — the
    outlier trim before per-source statistics. One grouped exact-
    percentile aggregate (distributed sort-agg), the tiny bounds table
    broadcast back, map-side clamp; the report re-aggregates per
    group. Exact percentile interpolation is bit-identical between
    Spark `percentile` and DuckDB `quantile_cont` (probed)."""
    ev = T(spark, sf_dir, "events")
    c = pipeline.winsorize(ev, "event_type", "value", 0.05, 0.95)
    return (
        c.groupBy("event_type")
        .agg(
            F.round(F.first("p_lo"), 4).alias("p_lo"),
            F.round(F.first("p_hi"), 4).alias("p_hi"),
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("value") < F.col("p_lo"), 1).otherwise(0)
            ).alias("n_clamped_lo"),
            F.sum(
                F.when(F.col("value") > F.col("p_hi"), 1).otherwise(0)
            ).alias("n_clamped_hi"),
            F.round(F.avg("value"), 4).alias("mean_raw"),
            F.round(F.avg("value_w"), 4).alias("mean_w"),
        )
        .orderBy("event_type")
    )


@query(
    "text_source_divergence",
    oracle=r"""
    WITH tok AS (
        SELECT source, t.tkn AS token
        FROM documents,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS t(tkn)
    ), st AS (
        SELECT source, token, count(*) AS c_st FROM tok GROUP BY 1, 2
    ), s AS (
        SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s,
               CAST(count(*) AS BIGINT) AS v_s
        FROM st GROUP BY source
    ), t AS (
        SELECT token, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY token
    ), n AS (
        SELECT CAST(sum(c_t) AS BIGINT) AS n_tot FROM t
    )
    SELECT st.source, any_value(s.n_s) AS n_tokens,
           any_value(s.v_s) AS n_distinct,
           round(sum((c_st * 1.0e0 / n_s)
                     * ln((c_st * 1.0e0 / n_s) / (c_t * 1.0e0 / n_tot))),
                 4) AS kl_vs_corpus
    FROM st JOIN s USING (source) JOIN t USING (token) CROSS JOIN n
    GROUP BY st.source ORDER BY st.source
    """,
)
def text_source_divergence(spark, sf_dir):
    """Per-source KL divergence of the unigram token distribution vs
    the whole corpus — the drift/contamination monitor of corpus
    mixing (a source whose KL spikes changed register or got
    polluted). One explode, counts at (source, token), then an
    equi-join on token to the corpus vocabulary counts (a keyed
    shuffle join — the vocab table is NOT broadcast; at 100 TB it is
    itself large) and one final per-source aggregate. Every
    probability is a ratio of exact counts, so the only float work is
    the final sum of p*ln terms, rounded at 4dp on both sides."""
    d = T(spark, sf_dir, "documents")
    tok = text._doc_spread(d, "doc_id").select(
        "source",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: x != F.lit(""),
            )
        ).alias("token"),
    )
    st = (
        tok.groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c_st"))
        # consumed three times (per-source totals, vocab totals, the
        # final join) — checkpoint so the explode+count runs once
        .localCheckpoint(eager=False)
    )
    s = st.groupBy("source").agg(
        F.sum("c_st").alias("n_s"), F.count(F.lit(1)).alias("v_s")
    )
    t = st.groupBy("token").agg(F.sum("c_st").alias("c_t"))
    n_tot = t.agg(F.sum("c_t").alias("n_tot"))
    p_s = F.col("c_st") / F.col("n_s")
    p_t = F.col("c_t") / F.col("n_tot")
    return (
        st.join(s, "source")
        .join(t, "token")
        .crossJoin(F.broadcast(n_tot))
        .groupBy("source")
        .agg(
            F.first("n_s").alias("n_tokens"),
            F.first("v_s").alias("n_distinct"),
            F.round(F.sum(p_s * F.log(p_s / p_t)), 4).alias(
                "kl_vs_corpus"
            ),
        )
        .orderBy("source")
    )


@query(
    "pipe_split_no_leakage",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, md5(text) AS f FROM documents
    ), rep AS (
        SELECT f, min(doc_id) AS rep_id FROM fp GROUP BY f
    ), assigned AS (
        SELECT fp.doc_id, fp.f,
               CASE WHEN ({pipeline.portable_hash_sql('rep_id')}) % 100 < 80
                        THEN 'train'
                    WHEN ({pipeline.portable_hash_sql('rep_id')}) % 100 < 90
                        THEN 'val'
                    ELSE 'test' END AS split
        FROM fp JOIN rep USING (f)
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT f) AS BIGINT) AS n_clusters,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM assigned GROUP BY split ORDER BY split
    """,
)
def pipe_split_no_leakage(spark, sf_dir):
    """Leakage-free train/val/test split: the split is decided by the
    portable hash of each duplicate-cluster REPRESENTATIVE (min doc_id
    per exact-text fingerprint), never the document itself — so
    duplicates can never straddle train and eval, the failure mode
    naive per-doc hashing has. 80/10/10, deterministic, replayed
    exactly by the oracle. One fingerprint aggregate + an equi-join
    back on the fingerprint (hash-partitioned both sides at 100 TB,
    the exact-dedup shuffle key); the split expression is map-side."""
    d = T(spark, sf_dir, "documents")
    fp = d.select("doc_id", F.md5("text").alias("f"))
    rep = fp.groupBy("f").agg(F.min("doc_id").alias("rep_id"))
    h = pipeline.portable_hash(F.col("rep_id")) % 100
    assigned = fp.join(rep, "f").withColumn(
        "split",
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test"),
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("f").alias("n_clusters"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("split")
    )
