"""Training-data pipeline operators beyond dedup/similarity: benchmark
decontamination, deterministic sampling/mixing, PII scrubbing, and
sequence packing.

These extend the reference's data-pipeline surface (ImportExport +
StringOps are the closest analogues — e.g. regex scrubbing reuses the
REGEXP_REPLACE kernel family of StringOps/StringOps.cpp) with the
operations a 100 TB LLM training-data build needs. Everything here is
JVM-side expression work except `pack_sequences`, whose greedy reset
semantics are inherently sequential per group and run as one Arrow
batch per group via applyInPandas.

Scale notes (100 TB):
- decontamination is a shingle equi-join (same blocking shape as
  operators/dedup.py ngram_jaccard_pairs) — never a cross join; the
  test side is usually tiny, so its shingle relation broadcasts.
- sampling/mixing filter on a *portable* multiplicative hash of the id
  (exact-arithmetic in int64 range), so the sample is reproducible
  across engines and runs, pushes down to the scan as a cheap
  predicate, and needs no shuffle at all.
- pii_scrub is pure regexp_replace chains — whole-stage codegen.
- pack_sequences shuffles once on the group key; each group's greedy
  scan is O(group) in a single Arrow batch.
"""

from __future__ import annotations

from typing import Iterable, Mapping

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from heavydb_spark.operators.dedup import token_shingles

# ------------------------------------------------------------ sampling

# Knuth multiplicative hash on a 31-bit modulus: exact in int64 for any
# bigint id (id is reduced mod 2^31-1 first), identical arithmetic in
# Spark and ANSI SQL — reproducible sampling without engine-specific
# hash functions.
_M31 = 2_147_483_647  # 2^31 - 1
_A = 48_271  # MINSTD multiplier


def portable_hash(id_col: Column) -> Column:
    """Deterministic pseudo-uniform value in [0, 2^31-1) from a bigint
    id, using only +/*/% so any SQL engine reproduces it exactly.

    Two LCG rounds: one round leaves small consecutive ids unmixed
    (id*A stays below the modulus until id ~ 44k), so a second
    multiply — whose effective stride A^2 mod M wraps immediately —
    equidistributes even dense id ranges. All intermediates stay
    < 2^63 (max (M-1)*A ~ 1.04e14)."""
    r = F.pmod(id_col.cast("long"), F.lit(_M31))
    r = F.pmod(r * _A + 11, F.lit(_M31))
    return F.pmod(r * _A, F.lit(_M31))


def portable_hash_sql(id_expr: str) -> str:
    """The ANSI-SQL text of `portable_hash` (for oracles and pushdown
    into external engines)."""
    r0 = f"((({id_expr}) % {_M31} + {_M31}) % {_M31})"
    r1 = f"(({r0} * {_A} + 11) % {_M31})"
    return f"({r1} * {_A}) % {_M31}"


def sample_hash(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose portable
    hash falls under `fraction` of the hash space. A pure filter — no
    shuffle, reproducible, and pushable to the scan."""
    cut = int(fraction * _M31)
    return df.filter(portable_hash(F.col(id_col)) < cut)


def epoch_oversample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    epochs: dict[str, float],
) -> DataFrame:
    """Deterministic multi-epoch oversampling — the "N epochs of
    source X" primitive of LLM data recipes (LLaMA/Gopher-style
    mixtures state fractional epoch counts per source): every doc of
    source s is replicated floor(epochs_s) times, plus one extra copy
    for the deterministic portable-hash fraction of docs that realizes
    the fractional part; sources absent from the recipe are dropped.
    Output: one row per (doc, epoch) with the 1-based `epoch` index.

    100 TB shape: a pure map-side explode — the recipe is a literal
    map, the fractional pick is the `sample_hash` filter (no shuffle,
    pushable), and replication happens at the scan, never through an
    exchange. Expected output volume = sum_s epochs_s * |s|."""
    mapping = F.create_map(
        *[F.lit(x) for kv in epochs.items() for x in kv]
    )
    ep = mapping[F.col(group_col)]
    whole = F.floor(ep).cast("int")
    frac = ep - whole
    extra = (
        portable_hash(F.col(id_col)) < (frac * _M31).cast("long")
    ).cast("int")
    n = whole + extra
    return (
        df.withColumn("__n_copies", n)
        # sequence(1, 0) DESCENDS in Spark — drop zero-copy rows first
        .filter(F.col("__n_copies") > 0)
        .select(
            "*", F.explode(
                F.sequence(F.lit(1), F.col("__n_copies"))
            ).alias("epoch"),
        )
        .drop("__n_copies")
    )


def sample_stratified(
    df: DataFrame, group_col: str, id_col: str, n_per_group: int
) -> DataFrame:
    """Deterministic stratified sample: the `n_per_group` rows with the
    smallest portable hash in each group (a seeded without-replacement
    draw). One hash shuffle on the group key; the per-group sort is
    window-local. At 100 TB prefer a two-phase variant (per-partition
    top-n then global top-n) — Spark's window TopK already does the
    partial rank pushdown under AQE."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        portable_hash(F.col(id_col)).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )


def mix_sources(
    df: DataFrame, source_col: str, id_col: str, weights: Mapping[str, float]
) -> DataFrame:
    """Weighted source mixing: keep a deterministic `weights[source]`
    fraction of each source's rows (sources absent from `weights` drop
    to 0). The standard data-mixture step of a training-data build —
    a single codegen'd filter, no shuffle."""
    h = portable_hash(F.col(id_col))
    cut = None
    for src, wgt in weights.items():
        c = F.when(F.col(source_col) == src, F.lit(int(wgt * _M31)))
        cut = c if cut is None else cut.when(
            F.col(source_col) == src, F.lit(int(wgt * _M31))
        )
    cut = cut.otherwise(F.lit(0)) if cut is not None else F.lit(0)
    return df.filter(h < cut)


# ----------------------------------------------------- decontamination


def decontaminate_ngram(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark decontamination: train docs sharing >= `min_overlap`
    distinct word n-grams with ANY test doc, with the matched test doc
    and overlap count — the n-gram-collision contamination check used
    on LLM pretraining corpora.

    Plan: both sides explode to distinct (doc, shingle) rows; shingle
    equi-join (blocking — never all-pairs); count distinct shared
    shingles per (train, test) pair. The test relation is tiny next to
    the corpus, so Spark broadcasts its shingles; at 100 TB this is one
    scan of train + a broadcast hash join.
    """
    tr = (
        train.select(
            F.col(id_col).alias("train_id"),
            F.explode(token_shingles(F.col(text_col), n)).alias("shingle"),
        )
        .distinct()
    )
    te = (
        test.select(
            F.col(id_col).alias("test_id"),
            F.explode(token_shingles(F.col(text_col), n)).alias("shingle"),
        )
        .distinct()
    )
    return (
        tr.join(F.broadcast(te), "shingle")
        .groupBy("train_id", "test_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
    )


# --------------------------------------------------------- PII scrub

# Patterns use only syntax shared by Java regex (Spark) and RE2
# (DuckDB/Go): no backrefs, no lookaround.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_scrub(text_col: Column) -> Column:
    """Redact common PII shapes (email, phone, SSN, IPv4) with typed
    placeholder tokens — chained regexp_replace, fully codegen'd
    (StringOps/StringOps.cpp REGEXP_REPLACE analogue)."""
    out = text_col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_scrub_sql(text_expr: str) -> str:
    """ANSI-SQL (DuckDB-compatible) text of `pii_scrub` for oracles."""
    out = text_expr
    for _, pat, repl in PII_PATTERNS:
        # standard SQL strings pass backslashes through verbatim — only
        # quotes need escaping
        sql_pat = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pat}', '{repl}', 'g')"
    return out


# ----------------------------------------------------- sequence packing


def pack_sequences(
    df: DataFrame,
    group_col: str,
    id_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Greedy sequence packing: within each group (ordered by id),
    assign docs to consecutive bins such that a bin's token total never
    exceeds `budget` unless a single doc alone exceeds it — the
    pre-tokenization packing step that turns documents into
    fixed-length training sequences.

    The reset-on-overflow recurrence is inherently sequential per
    group, so each group runs as one Arrow batch (applyInPandas) with a
    vector-free O(n) scan; the only shuffle is the groupBy on
    `group_col`. Output: (group, id, tokens, bin_id, bin_fill).
    """
    gtype = df.schema[group_col].dataType.simpleString()
    out_schema = (
        f"{group_col} {gtype}, {id_col} long, {tokens_col} long, "
        "bin_id long, bin_fill long"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, fills = [], []
        bin_id, fill = 0, 0
        first = True
        for tok in pdf[tokens_col]:
            tok = int(tok)
            if not first and fill + tok > budget:
                bin_id += 1
                fill = tok
            else:
                fill += tok
            first = False
            bins.append(bin_id)
            fills.append(fill)
        pdf = pdf[[group_col, id_col, tokens_col]].copy()
        pdf["bin_id"] = bins
        pdf["bin_fill"] = fills
        return pdf

    proj = df.select(
        F.col(group_col),
        F.col(id_col).cast("long").alias(id_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
    )
    return proj.groupBy(group_col).applyInPandas(_pack, out_schema)


# ------------------------------------------------- dictionary encoding


def build_dictionary(df: DataFrame, col: str) -> DataFrame:
    """String-dictionary build (reference StringDictionary/
    StringDictionary.cpp; TEXT ENCODING DICT of Shared/sqltypes.h):
    distinct values get dense 0-based ids in value-sort order.

    Scale-safe dense numbering without a single-partition window:
    range-partition the distinct values by `col`, number rows within
    each partition locally, then add per-partition offsets (a
    metadata-sized prefix sum broadcast back). The global sort is the
    one unavoidable cost of an ordered dictionary — same as the
    reference's sorted-id build.
    """
    from pyspark.sql import Window

    distinct = (
        df.select(F.col(col).alias("value"))
        .filter(F.col("value").isNotNull())
        .distinct()
        .repartitionByRange(F.col("value"))
        .withColumn("__pid", F.spark_partition_id())
    )
    local = distinct.withColumn(
        "__local",
        F.row_number().over(
            Window.partitionBy("__pid").orderBy("value")
        ),
    )
    offsets = (
        local.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__cnt").over(
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__offset")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .select(
            (F.col("__local") - 1 + F.col("__offset")).alias("code"),
            "value",
        )
    )


def dictionary_encode(
    df: DataFrame, cols: Iterable[str]
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Encode string columns to dense integer codes via broadcast join
    against their dictionaries (the reference's encoded-column scan
    shape: fragments store codes; the dictionary translates at the
    edges). Returns (encoded df with `<col>_code` columns, dicts)."""
    dicts: dict[str, DataFrame] = {}
    out = df
    for col in cols:
        d = build_dictionary(df, col)
        dicts[col] = d
        out = out.join(
            F.broadcast(
                d.select(
                    F.col("value").alias(col),
                    F.col("code").alias(f"{col}_code"),
                )
            ),
            col,
            "left",
        )
    return out, dicts


# ------------------------------------------- cross-corpus dedup policy


def dedup_keep_best(
    df: DataFrame,
    cluster_col: str,
    priority_col: str,
    id_col: str,
) -> DataFrame:
    """Cross-corpus dedup policy: within each duplicate cluster keep
    exactly one row — the one with the best (lowest) priority, ties
    broken by id. The standard multi-corpus corpus-build rule ("when a
    document appears in both a curated and a crawled source, keep the
    curated copy"), composing with any cluster key (exact fingerprint,
    MinHash component id from dedup.connected_components, or a
    normalized prefix).

    Scale shape: ONE hash shuffle on the cluster key; the winner is a
    map-side-combinable min over the (priority, id) struct — no window
    function, no second pass over the data. Returns one row per
    cluster: (cluster, keep_id, best_priority, n_dups).
    """
    return (
        df.groupBy(F.col(cluster_col).alias("cluster"))
        .agg(
            F.min_by(
                F.col(id_col), F.struct(F.col(priority_col), F.col(id_col))
            ).alias("keep_id"),
            F.min(priority_col).alias("best_priority"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def mix_token_budget(
    df: DataFrame,
    source_col: str,
    id_col: str,
    token_col: str,
    budgets: Mapping[str, int],
) -> DataFrame:
    """Token-budget source mixing — the data-recipe step that samples
    each source UP TO a token budget instead of a row fraction: docs
    are taken in deterministic portable-hash order until the source's
    cumulative token count reaches `budgets[source]` (a doc is kept
    while the running total BEFORE it is under budget, so the
    boundary-crossing doc is included and every budget > 0 yields at
    least one doc; sources absent from the mapping drop out).

    Plan shape: one window per source partition ordered by
    (portable_hash, id) — a per-source sort, the same cost class as
    the reference's ORDER BY + LIMIT sampling. At extreme scale the
    hash-order prefix can be approximated by a hash-threshold binary
    search (two scans, no sort); the exact window form is kept here
    because it is deterministic and oracle-checkable row-for-row."""
    from pyspark.sql import Window

    h = portable_hash(F.col(id_col))
    budget = None
    for src, b in budgets.items():
        c = F.when(F.col(source_col) == src, F.lit(int(b)))
        budget = c if budget is None else budget.when(
            F.col(source_col) == src, F.lit(int(b))
        )
    budget = budget.otherwise(F.lit(0)) if budget is not None else F.lit(0)
    w = (
        Window.partitionBy(source_col)
        .orderBy(h.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0))
    return (
        df.withColumn("__prior_tokens", prior)
        .filter(F.col("__prior_tokens") < budget)
        .drop("__prior_tokens")
    )


def mix_token_budget_sql(
    source_expr: str, id_expr: str, token_expr: str,
    budgets: Mapping[str, int], table: str = "documents",
) -> str:
    """ANSI-SQL text of `mix_token_budget` (DuckDB oracle): same
    portable-hash order, same strict prior-sum-under-budget rule."""
    cases = " ".join(
        f"WHEN '{src}' THEN {int(b)}" for src, b in budgets.items()
    )
    h = portable_hash_sql(id_expr)
    return f"""
    WITH ordered AS (
        SELECT *,
               coalesce(sum({token_expr}) OVER (
                   PARTITION BY {source_expr}
                   ORDER BY {h} ASC, {id_expr} ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS __prior_tokens,
               CASE {source_expr} {cases} ELSE 0 END AS __budget
        FROM {table}
    )
    SELECT * EXCLUDE (__prior_tokens, __budget) FROM ordered
    WHERE __prior_tokens < __budget
    """


# ------------------------------------------- DSIR importance selection


def dsir_importance(
    df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    seed: int = 11,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    score every raw document by how much it resembles a TARGET corpus,
    via hashed-feature importance ratios — the standard recipe for
    "select pretraining data that looks like the high-quality domain".

    Features are hashed unigrams (portable 31-bit hash mod `n_buckets`);
    the target and raw bucket distributions are Laplace-smoothed
    (alpha = 1), and each document scores the MEAN log importance ratio
    of its tokens:

        avg_log_ratio = mean_t ln( p_target(h(t)) / p_raw(h(t)) )

    `selected` marks docs more target-like than raw-like (ratio >= 0).
    (The paper resamples with Gumbel noise; the deterministic
    threshold form keeps the whole operator exactly oracle-checkable —
    a caller wanting sampled selection composes this with
    `sample_hash` on the selected set.)

    Scale shape: two bucket histograms (map-side-combined counts into
    <= n_buckets rows), histogram + total broadcast back onto the
    token stream, one per-doc aggregate. Never a driver collect; the
    token stream is scanned twice (once per histogram side) only if
    target is not a subset filter of raw — pass target_df as a filter
    of df and Spark reuses the scan.
    """
    B = float(n_buckets)

    def tok_rows(frame):
        from heavydb_spark.operators.dedup import portable_token_hash
        from heavydb_spark.operators.text import tokens

        return frame.select(
            F.col(id_col).alias("doc"),
            F.explode(tokens(F.col(text_col))).alias("t"),
        ).select(
            "doc",
            F.pmod(portable_token_hash(F.col("t"), seed), F.lit(n_buckets))
            .cast("int")
            .alias("b"),
        )

    raw = tok_rows(df).localCheckpoint(eager=False)
    tgt = tok_rows(target_df)
    th = tgt.groupBy("b").agg(F.count(F.lit(1)).alias("tc"))
    rh = raw.groupBy("b").agg(F.count(F.lit(1)).alias("rc"))
    tt = tgt.agg(F.count(F.lit(1)).alias("tn"))
    rt = raw.agg(F.count(F.lit(1)).alias("rn"))
    lr = F.log(
        ((F.coalesce(F.col("tc"), F.lit(0)) + F.lit(1.0)) / (F.col("tn") + F.lit(B)))
        / ((F.coalesce(F.col("rc"), F.lit(0)) + F.lit(1.0)) / (F.col("rn") + F.lit(B)))
    )
    scored = (
        raw.join(F.broadcast(th), "b", "left")
        .join(F.broadcast(rh), "b", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .select("doc", lr.alias("lr"))
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("lr") / F.count(F.lit(1)), 6).alias(
                "avg_log_ratio"
            ),
        )
    )
    return scored.select(
        F.col("doc").alias(id_col),
        "n_tokens",
        "avg_log_ratio",
        (F.col("avg_log_ratio") >= 0).alias("selected"),
    )


# ------------------------------------------------- temperature mixing


def mix_temperature(
    df: DataFrame,
    source_col: str,
    id_col: str,
    alpha: float = 0.5,
    target_fraction: float = 0.5,
) -> DataFrame:
    """Temperature-scaled multinomial source mixing — the q_s ∝ n_s^α
    recipe of multilingual / multi-source pretraining (alpha < 1
    up-samples small sources relative to their natural share). Each
    source keeps a deterministic hash fraction

        f_s = min(1, (n_s^α / Σ_t n_t^α) · T / n_s),

    where T = floor(target_fraction · N + 0.5) is the token-free
    row target; f_s is rounded to 6dp before the hash cut so the
    boundary is reproducible across engines.

    Plan shape / 100 TB: per-source counts are one tiny aggregate;
    the rate table (|sources| rows) broadcast-joins back and the keep
    rule is a single codegen'd filter on the portable hash — the
    corpus itself is never shuffled.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n_s"))
    tot = counts.agg(
        F.sum("__n_s").alias("__n_total"),
        F.sum(F.pow(F.col("__n_s").cast("double"), F.lit(alpha))).alias(
            "__z"
        ),
    )
    target = F.floor(
        F.lit(float(target_fraction)) * F.col("__n_total") + F.lit(0.5)
    )
    rate = F.round(
        F.least(
            F.lit(1.0),
            F.pow(F.col("__n_s").cast("double"), F.lit(alpha))
            / F.col("__z")
            * target
            / F.col("__n_s"),
        ),
        6,
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        source_col,
        rate.alias("__rate"),
        F.floor(rate * _M31).cast("long").alias("__cut"),
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(portable_hash(F.col(id_col)) < F.col("__cut"))
        .withColumn("mix_rate", F.col("__rate"))
        .drop("__rate", "__cut")
    )


def mix_temperature_sql(
    source_expr: str,
    id_expr: str,
    alpha: float = 0.5,
    target_fraction: float = 0.5,
    table: str = "documents",
) -> str:
    """ANSI-SQL text of `mix_temperature` (DuckDB oracle): identical
    count → rate → 6dp-round → hash-cut chain, double arithmetic
    forced with e-notation literals."""
    h = portable_hash_sql(id_expr)
    rate = (
        f"round(least(1.0e0, pow(CAST(__n_s AS DOUBLE), {alpha}e0) / __z"
        f" * floor({target_fraction}e0 * __n_total + 0.5e0)"
        f" / __n_s), 6)"
    )
    return f"""
    WITH __c AS (
        SELECT {source_expr} AS __src, count(*) AS __n_s
        FROM {table} GROUP BY 1
    ), __t AS (
        SELECT sum(__n_s) AS __n_total,
               sum(pow(CAST(__n_s AS DOUBLE), {alpha}e0)) AS __z
        FROM __c
    ), __r AS (
        SELECT __src, {rate} AS __rate,
               CAST(floor({rate} * {_M31}) AS BIGINT) AS __cut
        FROM __c CROSS JOIN __t
    )
    SELECT d.*, r.__rate AS mix_rate
    FROM {table} d JOIN __r r ON d.{source_expr} = r.__src
    WHERE ({h}) < r.__cut
    """


# ------------------------------------------------- output sharding


def shard_assign(
    df: DataFrame,
    id_col: str,
    n_shards: int,
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the final
    step of a training-data build, producing the (shard, position)
    layout a data loader consumes. Shard membership is the portable
    hash mod `n_shards` (balanced in expectation, reproducible across
    engines and runs); position within a shard is the rank in
    (hash, id) order.

    Scale shape / 100 TB: NO global ordering anywhere — a corpus-wide
    row_number would serialize into one window partition. Membership
    is a map-side expression and the position window partitions BY
    SHARD, so the sort parallelizes `n_shards` ways and each partition
    holds one shard's rows (exactly the file a loader reads)."""
    from pyspark.sql import Window

    h = portable_hash(F.col(id_col))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("__h").asc(), F.col(id_col).asc())
    )
    return (
        df.withColumn("__h", h)
        .withColumn(
            "shard", F.pmod(F.col("__h"), F.lit(n_shards)).cast("int")
        )
        .withColumn("pos", F.row_number().over(w) - 1)
        .drop("__h")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, top-k
    (Efraimidis–Spirakis A-ES): each row draws u in (0, 1] from the
    portable hash of its id and ranks by ln(u) / w — the k largest
    keys are an exact weighted sample without replacement. Inclusion
    probability scales with weight; the 'sample by quality score /
    length' primitive of corpus curation.

    100 TB shape: the key is a map-side expression; selection is a
    TakeOrderedAndProject top-k (per-partition heads, k-row driver
    merge) — no shuffle, no global sort. Deterministic end-to-end:
    the hash replays in any engine, so the oracle reproduces the
    exact sample (ties are measure-zero; ordering falls back to id).

    Rows with weight <= 0 are excluded (A-ES is undefined there)."""
    u = (portable_hash(F.col(id_col)) + 1.0) / float(_M31)
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("es_key", key)
        .orderBy(F.desc("es_key"), F.col(id_col))
        .limit(k)
    )


def weighted_sample_sql(
    table: str, id_expr: str, weight_expr: str, k: int
) -> str:
    """DuckDB twin of weighted_sample over `table` (same hash, same
    key arithmetic — bit-identical doubles, so the identical rows)."""
    h = portable_hash_sql(id_expr)
    return f"""
    SELECT *, ln((({h}) + 1.0e0) / {float(_M31)!r})
              / CAST({weight_expr} AS DOUBLE) AS es_key
    FROM {table}
    WHERE ({weight_expr}) > 0
    ORDER BY es_key DESC, {id_expr}
    LIMIT {k}
    """


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group winsorization: clamp `value_col` to the group's exact
    [lo, hi] interpolated percentiles — the outlier-trimming cleanup a
    pipeline runs before computing per-source statistics.

    100 TB shape: one grouped aggregate computes the two exact
    percentiles per group (distributed sort-based agg, same class as
    the corpus report's median); the tiny bounds table broadcasts
    back onto the scan (groups << rows), and the clamp is a map-side
    `least/greatest`. Two passes over the data, zero wide joins."""
    bounds = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, {lo!r})").alias("p_lo"),
        F.expr(f"percentile({value_col}, {hi!r})").alias("p_hi"),
    )
    clamped = df.join(F.broadcast(bounds), group_col).withColumn(
        "value_w",
        F.least(F.greatest(F.col(value_col), F.col("p_lo")), F.col("p_hi")),
    )
    return clamped
