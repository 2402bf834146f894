"""Text analysis operators for the documents table.

BASELINE.json extension surface: language-ID, quality scoring, token
counting, document fingerprinting. Reference analogues are the string-op
kernels (StringOps/StringOps.cpp) composed into pipeline-grade features.

Everything is built-in Spark functions (codegen'd) — deliberately
SQL-expressible so the DuckDB oracle can verify identical formulas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic marker-token lists per language (shared with oracle SQL).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "y"),
    "fr": ("le", "la", "de", "et"),
    "de": ("der", "die", "das", "und"),
    "zh": ("de5", "le5", "shi4", "he2"),
}


def tokens(text_col: Column) -> Column:
    return F.split(F.trim(text_col), r"\s+")


def token_count(text_col: Column) -> Column:
    """Whitespace token count (reference: LEN/SPLIT_PART string-op family)."""
    return F.size(tokens(text_col))


def bpe_ish_token_count(text_col: Column) -> Column:
    """BPE-approximation: word-piece-ish segments via regex split on word
    boundaries and 4-char chunks — a deterministic stand-in for a real
    tokenizer (ratio ~chars/4 for long words)."""
    words = tokens(text_col)
    return F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("int"),
    )


def marker_count(text_col: Column, markers: tuple[str, ...]) -> Column:
    """How many tokens are in the marker list (JVM filter, no UDF)."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens(F.lower(text_col)), lambda t: F.array_contains(arr, t)))


def lang_id(text_col: Column) -> Column:
    """Deterministic n-gram/stopword language heuristic: argmax of marker
    counts, ties broken by language code order, 'und' if no markers."""
    scores = {lang: marker_count(text_col, m) for lang, m in LANG_MARKERS.items()}
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(LANG_MARKERS):  # deterministic tie-break
        s = scores[lang]
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/digit/stopword-ratio quality features + a
    composite score — the classic pre-training quality filter shape."""
    import string

    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    # counting by DELETING the class via translate (a char-table pass,
    # ~3x cheaper than the regex engine) — n_class = len - len(without)
    n_alpha = n_chars - F.length(F.translate(t, string.ascii_letters, ""))
    n_digit = n_chars - F.length(F.translate(t, string.digits, ""))
    n_punct = n_chars - F.length(F.translate(t, ".,;:!?", ""))
    n_stop = marker_count(t, LANG_MARKERS["en"])
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tokens.alias("q_tokens"),
        F.round(n_chars / n_tokens, 4).alias("q_avg_token_len"),
        F.round(n_alpha / n_chars, 4).alias("q_alpha_ratio"),
        F.round(n_digit / n_chars, 4).alias("q_digit_ratio"),
        F.round(n_punct / n_chars, 4).alias("q_punct_ratio"),
        F.round(n_stop / n_tokens, 4).alias("q_stopword_ratio"),
    )


def fingerprint(text_col: Column) -> Column:
    """Normalization fingerprint: lowercase, strip non-alphanumerics to
    spaces, collapse whitespace, md5. Identical formula in the oracle."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(text_col), r"[^a-z0-9]+", " "), r"\s+", " "
        )
    )
    return F.md5(norm)


# --------------------------------------------- model-based quality score

_PM31 = 2_147_483_647  # shared with operators/dedup portable hashing
_PA = 48_271


def classifier_weights(n_buckets: int = 64, seed: int = 9) -> list[float]:
    """Deterministic per-bucket weights in [-1, 1): one MINSTD stream,
    rounded to 9 dp so the literals round-trip exactly through both
    engines' decimal parsers."""
    out, x = [], seed
    for _ in range(n_buckets):
        x = (x * _PA) % _PM31
        out.append(round(x / _PM31 * 2.0 - 1.0, 9))
    return out


def quality_classifier_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    seed: int = 9,
    bias: float = 0.05,
) -> DataFrame:
    """Hashed-bag-of-words linear quality classifier — the fastText /
    CCNet pattern used to score pretraining documents against a
    reference corpus, as pure JVM expressions.

    The model is (weights, bias) over `n_buckets` hashed token features:
    logit(doc) = bias + mean over tokens of w[h(token) mod n_buckets].
    A trained model would supply `w` from its fit; here `w` is a seeded
    MINSTD stream (`classifier_weights`) inlined as a literal array and
    `h` is the portable 31-bit token hash, so scoring — the part that
    runs over 100 TB — is exactly reproducible cross-engine. Left-fold
    summation order is identical in Spark's `aggregate` and DuckDB's
    `list_sum`, so the logit is bit-identical before rounding.

    No Python anywhere: one map-side expression per row, no shuffle.
    """
    from heavydb_spark.operators.dedup import portable_token_hash

    w = classifier_weights(n_buckets, seed)
    warr = F.array(*[F.lit(v) for v in w])
    toks = tokens(F.col(text_col))
    term = lambda t: F.element_at(  # noqa: E731
        warr,
        (F.pmod(portable_token_hash(t, seed), F.lit(n_buckets)) + 1).cast(
            "int"
        ),
    )
    n = F.size(toks)
    s = F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + term(t))
    logit = F.round(F.lit(bias) + s / n, 6)
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        logit.alias("quality_logit"),
        (logit >= 0).alias("quality_label"),
    )


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition-based quality signals (the Gopher-rule family used to
    filter boilerplate/spam from pretraining corpora): fraction of
    tokens taken by the single most frequent word, fraction of bigrams
    taken by the most frequent bigram, and the distinct-token ratio.

    Pure higher-order-function Column expressions — O(distinct·n) per
    document on the JVM, no shuffle, no Python."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")

    def top_count(arr):
        return F.array_max(
            F.transform(
                F.array_distinct(arr),
                lambda w: F.size(F.filter(arr, lambda x: x == w)),
            )
        )

    n = F.size(words)
    bigrams = F.zip_with(
        F.slice(words, 1, n - 1),
        F.slice(words, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return df.select(
        "*",
        F.round(top_count(words) / n, 4).alias("r_top_word"),
        F.round(top_count(bigrams) / F.size(bigrams), 4).alias("r_top_bigram"),
        F.round(F.size(F.array_distinct(words)) / n, 4).alias("r_distinct"),
    )


# ------------------------------------------------ n-gram LM perplexity


def lm_perplexity_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_df: DataFrame | None = None,
) -> DataFrame:
    """Bigram language-model perplexity per document — the CCNet/KenLM
    quality signal (score a document against a reference-corpus LM;
    high perplexity = unusual text) with a deterministic stand-in LM:
    add-one-smoothed bigram MLE counts trained on `train_df` (default:
    the scored corpus itself — self-perplexity outlier detection).

    P(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V); per doc the mean log
    probability over its bigrams and ppl = exp(-mean). Everything is
    count arithmetic + one ln per distinct bigram — SQL-expressible,
    so the oracle replays it exactly (log/exp rounded on both sides:
    cross-engine libm ulp + double reassociation are absorbed, the
    same convention as every rounded float aggregate in the catalog).

    Plan shape at 100 TB: one shuffle of bigram rows to count c2, one
    to count c1 (prefix totals), the vocabulary size V as a 1-row
    broadcast scalar (the q88 threshold pattern), then bigram-keyed
    co-partitioned joins back and one per-doc aggregate. No all-pairs,
    no Python, no driver collect.
    """
    if train_df is None:
        train_df = df

    def toks(frame):
        return frame.select(
            F.col(id_col).alias("doc"),
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("t"),
        )

    def bigrams(frame):
        m = F.greatest(F.size("t") - 1, F.lit(0))
        return (
            toks(frame)
            .select(
                "doc",
                F.explode(
                    F.arrays_zip(
                        F.slice("t", 1, m).alias("w1"),
                        F.slice("t", 2, m).alias("w2"),
                    )
                ).alias("b"),
            )
            .select("doc", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        )

    train_big = bigrams(train_df).localCheckpoint(eager=False)
    c2 = train_big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = train_big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        toks(train_df)
        .select(F.explode("t").alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )
    score_big = bigrams(df) if train_df is not df else train_big
    from pyspark.sql.functions import broadcast

    scored = (
        score_big.join(c2, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(broadcast(vocab))
        .select(
            "doc",
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + 1).cast("double")
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
            ).alias("lp"),
        )
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp").alias("sll"),
        )
    )
    avg_ll = F.col("sll") / F.col("n_bigrams")
    return (
        toks(df)
        .select("doc")
        .join(scored, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round(avg_ll, 6).alias("avg_logprob"),
            F.round(F.exp(-avg_ll), 4).alias("ppl"),
        )
    )


# ------------------------------------------------ corpus vocabulary stats


def ngram_list(text_col: Column, n: int = 2) -> Column:
    """ALL word n-gram occurrences of a text column, position order,
    duplicates preserved — the counting variant of
    `operators/dedup.py token_shingles` (which distincts per doc for
    set semantics). JVM higher-order functions, no UDF."""
    toks = tokens(text_col)
    k = F.size(toks) - (n - 1)
    return F.when(
        k <= 0, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        )
    )


def ngram_vocab(
    df: DataFrame, id_col: str, text_col: str, n: int = 2, top_k: int = 25
) -> DataFrame:
    """Corpus n-gram vocabulary report: the `top_k` most frequent word
    n-grams with occurrence and document frequencies — the Zipf-head
    inspection a corpus build runs before tokenizer training.
    Deterministic tiebreak: count desc, then gram asc.

    Plan shape / 100 TB: explode → one hash-shuffle groupBy on the
    gram (map-side partial agg) → TakeOrderedAndProject for the head.
    Never materializes the full sorted vocabulary."""
    g = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(ngram_list(F.col(text_col), n)).alias("gram"),
    )
    return (
        g.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.countDistinct("__doc").alias("doc_freq"),
        )
        .orderBy(F.col("occurrences").desc(), F.col("gram").asc())
        .limit(top_k)
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, top_k: int = 3
) -> DataFrame:
    """Per-document top-`top_k` terms by tf-idf (idf = ln(N/df), df =
    documents containing the term) — the keyword-extraction pass of a
    corpus indexing pipeline. Scores are 6dp-rounded BEFORE ranking so
    the (score desc, term asc) order is reproducible across engines.

    Plan shape / 100 TB: one explode → (doc, term) counts (shuffle on
    (doc, term)); document frequencies aggregate from that same
    relation (shuffle on term, then a broadcast-size corpus-count
    scalar); the per-doc head is a bounded rank window partitioned by
    the doc id."""
    from pyspark.sql import Window

    tf = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.countDistinct(id_col).alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log(F.col("n").cast("double") / F.col("df")),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select(
            F.col("doc").alias(id_col),
            "term",
            "tf",
            "df",
            "score",
            F.col("rnk").alias("term_rank"),
        )
    )


# ------------------------------------------------------- BPE training


def _bpe_symbols(word_col: Column) -> Column:
    """Initial BPE symbol sequence of a word: its characters plus the
    canonical end-of-word marker (Sennrich et al. 2016,
    arXiv:1508.07909 — the marker lets merges distinguish suffixes
    from infixes)."""
    chars = F.filter(
        F.split(word_col, r"(?!^)"), lambda c: c != F.lit("")
    )
    return F.concat(chars, F.array(F.lit("</w>")))


def _bpe_pairs(words: DataFrame) -> DataFrame:
    """Adjacent symbol-pair frequencies over a (symbols, freq)
    word-type table — the argmax relation of one BPE round."""
    z = F.arrays_zip(
        F.slice(F.col("symbols"), 1, F.size("symbols") - 1).alias("l"),
        F.slice(F.col("symbols"), 2, F.size("symbols") - 1).alias("r"),
    )
    return (
        words.filter(F.size("symbols") >= 2)
        .select(F.col("freq"), F.explode(z).alias("p"))
        .groupBy(
            F.col("p.l").alias("left"), F.col("p.r").alias("right")
        )
        .agg(F.sum("freq").alias("pair_count"))
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str, top_k: int = 5
) -> DataFrame:
    """The first BPE round's pair-count head: the `top_k` most frequent
    adjacent initial-symbol pairs over the corpus word-type table —
    SQL-expressible exactly (unlike the iterative trainer), so it
    serves as the oracle-checkable contract for `bpe_train`'s first
    merge. Tiebreak (count desc, left asc, right asc)."""
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(_bpe_symbols(F.col("word")).alias("symbols"), "freq")
    )
    return (
        _bpe_pairs(words)
        .orderBy(
            F.col("pair_count").desc(),
            F.col("left").asc(),
            F.col("right").asc(),
        )
        .limit(top_k)
    )


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int = 10
) -> DataFrame:
    """Byte-pair-encoding tokenizer training, distributed (Sennrich et
    al. 2016, arXiv:1508.07909): greedy merges over the corpus
    WORD-TYPE table (the classic formulation — merges are computed on
    distinct words weighted by frequency, so the iteration cost is
    bounded by vocabulary size, not corpus size). Returns the learned
    merge table: (step, left, right, merged, pair_count), the exact
    artifact a tokenizer ships.

    Per round: adjacent-pair frequencies over the symbol sequences
    (one shuffle on the pair), a deterministic argmax (count desc,
    left asc, right asc — a 1-row sanctioned collect), then the merge
    applied to every word's symbols as a left-to-right greedy fold
    (JVM higher-order `aggregate`, no UDF). `n_merges` rounds total.

    Scale shape / 100 TB: the word-type table is one corpus shuffle,
    then every round touches only the vocabulary relation (|types| ≪
    corpus tokens); each round localCheckpoints eagerly so lineage
    stays flat and the next round's pair count reads materialized
    symbols. The trainer is inherently iterative — no SQL oracle; its
    first round is pinned exactly by `bpe_pair_counts`, and the full
    merge sequence by the Sennrich worked-example unit test."""
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(_bpe_symbols(F.col("word")).alias("symbols"), "freq")
        .localCheckpoint(eager=True)
    )
    spark = df.sparkSession
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        best = (
            _bpe_pairs(words)
            .orderBy(
                F.col("pair_count").desc(),
                F.col("left").asc(),
                F.col("right").asc(),
            )
            .limit(1)
            .collect()  # 1 row: the round's argmax — sanctioned O(1)
        )
        if not best:
            break
        left, right, cnt = (
            best[0]["left"], best[0]["right"], best[0]["pair_count"]
        )
        merged = left + right
        merges.append((step, left, right, merged, cnt))
        fold = F.aggregate(
            F.col("symbols"),
            F.expr("cast(array() as array<string>)"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (x == F.lit(right)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.lit(merged)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        words = words.select(
            fold.alias("symbols"), "freq"
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "step int, left string, right string, merged string, "
        "pair_count bigint",
    )


def _bpe_merge_fold(symbols: Column, left: str, right: str) -> Column:
    """One BPE merge applied to a symbol array as the trainer's greedy
    left-to-right fold (JVM higher-order `aggregate`, no UDF)."""
    merged = left + right
    return F.aggregate(
        symbols,
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_encode_words(
    df: DataFrame, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """BPE ENCODING of the corpus word-type table: apply a learned
    merge list (priority order, e.g. `bpe_train`'s (left, right)
    pairs) to every distinct word's initial symbol sequence. Each
    merge is one greedy left-to-right fold — the exact operation the
    trainer performed per round, so for any word that appeared in
    training, `bpe_encode_words(corpus, merges) == the trainer's final
    symbol table` (the differential unit test pins this).

    Returns (word, symbols array<string>, n_subwords). Scale shape /
    100 TB: encoding touches only the word-TYPE relation (|types| <<
    corpus tokens — one distinct shuffle), and the merge chain is a
    single codegen'd expression tree (no per-merge pass over data, no
    UDF, no driver loop)."""
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .distinct()
    )
    sym: Column = _bpe_symbols(F.col("word"))
    for left, right in merges:
        sym = _bpe_merge_fold(sym, left, right)
    return words.select(
        "word",
        sym.alias("symbols"),
        F.size(sym).alias("n_subwords"),
    )


def bpe_encode_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Per-document BPE token accounting under a learned merge list:
    the deploy-side half of the tokenizer loop (`bpe_train` learns the
    merges; this op applies them corpus-wide). Returns one row per doc
    — (`{id_col}`, n_words, n_subwords, compression = words-per-
    subword ratio rounded 4dp). `n_subwords` counts the canonical
    `</w>` end-of-word markers, so n_subwords >= n_words always.

    Plan shape / 100 TB: word-types are encoded ONCE (see
    `bpe_encode_words` — |types| << corpus tokens), then a broadcast
    join decorates the exploded corpus tokens with their subword
    counts (vocabularies fit in memory by construction; drop the hint
    and AQE falls back to a hash join if one ever does not), and one
    hash-shuffle groupBy on the doc id aggregates. The document text
    is never re-scanned per merge."""
    enc = bpe_encode_words(df, text_col, merges).select(
        "word", "n_subwords"
    )
    toks = _doc_spread(df, id_col).select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("word"),
    )
    return (
        toks.join(F.broadcast(enc), "word")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_subwords").alias("n_subwords"),
            # floor(x*1e4 + 0.5)/1e4, not round(): cross-engine-stable
            # on exact .xxx5 halves (Spark HALF_UPs the shortest repr,
            # DuckDB rounds the raw double).
            (
                F.floor(
                    F.count(F.lit(1)) * 1.0e4 / F.sum("n_subwords")
                    + 0.5
                )
                / 1.0e4
            ).alias("compression"),
        )
        .select(
            F.col("doc").alias(id_col),
            "n_words",
            F.col("n_subwords").cast("long").alias("n_subwords"),
            "compression",
        )
    )


def _doc_spread(df: DataFrame, key_col: str) -> DataFrame:
    """Hash-repartition on the doc key before the explode (a small
    single-file scan arrives as 1 partition; see dedup._spread and
    session.spread_partition_count for why the count is explicit)."""
    from heavydb_spark.session import spread_partition_count

    return df.repartition(
        spread_partition_count(df.sparkSession), F.col(key_col)
    )


# ----------------------------------------------- heavy hitters (top-k)


def heavy_hitters(
    df: DataFrame,
    text_col: str,
    k: int = 20,
    candidate_factor: int = 4,
) -> DataFrame:
    """EXACT corpus top-k tokens via the two-pass heavy-hitters plan
    (Misra-Gries 1982 summaries + exact recount — the
    candidate-then-verify scheme of MG/SpaceSaving deployments): each
    partition folds its tokens into a Misra-Gries summary of capacity
    `cap = k * candidate_factor` (when the summary overflows, the
    batch decrement subtracts an equal mass from ALL tracked tokens
    and drops the non-positive — every decrement event charges >= cap+1
    tokens, so a token's total undercount is <= n_p / (cap+1) and any
    token with partition frequency above that bound SURVIVES); the
    union of summaries is a candidate superset of every token with
    global frequency > N / (cap+1); candidates broadcast back for an
    exact recount restricted to them, then the exact top-k.

    The result carries a `certified` flag: true iff the k-th count
    exceeds N / (cap+1), in which case the superset property makes
    the answer PROVABLY equal to the exact top-k — the certificate a
    pipeline checks before trusting the cheap plan.

    100 TB shape: the full vocabulary never shuffles — pass 1 is
    map-only (one Arrow-batched summary per partition, O(cap) rows
    out per partition), pass 2's count groupBy shuffles only
    candidate-token rows (the broadcast semi-join drops the long
    tail at the scan), and the final top-k is a TakeOrdered."""
    import pandas as pd

    cap = k * candidate_factor

    def summarize(it):
        counters: dict[str, int] = {}
        for pdf in it:
            vc = (
                pdf[text_col].str.strip().str.split().explode()
                .value_counts()
            )
            for tok, c in vc.items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > cap:
                vals = sorted(counters.values())
                d = vals[len(vals) - cap - 1]
                counters = {
                    t: c - d for t, c in counters.items() if c > d
                }
        yield pd.DataFrame({"token": list(counters)})

    cands = (
        df.select(text_col)
        .mapInPandas(summarize, "token string")
        .distinct()
    )
    toks = df.select(
        F.explode(tokens(F.col(text_col))).alias("token")
    )
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    counted = (
        toks.join(F.broadcast(cands), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    ranked = counted.select(
        "token", "cnt", F.row_number().over(w).cast("int").alias("rank")
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(
            "certified",
            F.min("cnt").over(
                Window.partitionBy()
            ) > F.col("n") / F.lit(float(cap + 1)),
        )
        .select("token", "cnt", "rank", "certified")
        .orderBy("rank")
    )


# ---------------------------------------------- Gopher composite filter


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_avg_word_len: float = 3.0,
    max_avg_word_len: float = 10.0,
    max_top_word: float = 0.2,
    min_distinct: float = 0.3,
) -> DataFrame:
    """The Gopher-rule composite document filter (Rae et al. 2021,
    arXiv:2112.11446 §A1.1): the keep/drop decision plus one boolean
    per rule, so a curation run can report WHICH rule rejected each
    document — length band, mean-word-length band, top-word
    repetition cap, and distinct-token floor. Ratios are 4dp-rounded
    before the threshold compare on both engines, so boundary docs
    resolve identically cross-engine.

    One map-side pass of higher-order expressions — no shuffle, no
    Python; compose before dedup in a pipeline (cheapest filter
    first)."""
    words = tokens(F.col(text_col))
    n = F.size(words)
    avg_wlen = F.round(
        F.aggregate(
            words, F.lit(0), lambda acc, w: acc + F.length(w)
        )
        / n,
        4,
    )
    top_word = F.round(
        F.array_max(
            F.transform(
                F.array_distinct(words),
                lambda w: F.size(F.filter(words, lambda x: x == w)),
            )
        )
        / n,
        4,
    )
    distinct_ratio = F.round(F.size(F.array_distinct(words)) / n, 4)
    ok_len = (n >= min_tokens) & (n <= max_tokens)
    ok_wlen = (avg_wlen >= min_avg_word_len) & (
        avg_wlen <= max_avg_word_len
    )
    ok_top = top_word <= max_top_word
    ok_distinct = distinct_ratio >= min_distinct
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        avg_wlen.alias("avg_word_len"),
        top_word.alias("r_top_word"),
        distinct_ratio.alias("r_distinct"),
        ok_len.alias("ok_len"),
        ok_wlen.alias("ok_word_len"),
        ok_top.alias("ok_top_word"),
        ok_distinct.alias("ok_distinct"),
        (ok_len & ok_wlen & ok_top & ok_distinct).alias("kept"),
    )


# ------------------------------------------- token-window chunking


def chunk_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Overlapping token-window chunking — the context-window splitter a
    pretraining/RAG pipeline runs before tokenize-and-pack or embedding:
    windows start at 0, stride, 2*stride, ... while start < n_tokens,
    each covering tokens[start : start+size] (the last may be shorter),
    so consecutive chunks overlap by `size - stride` tokens and every
    token is covered.

    Extends the reference's text surface (StringOps/StringOps.cpp
    SPLIT_PART/REGEXP kernels operate per-string; the reference has no
    chunk exploder — this is the training-pipeline addition).

    100 TB shape: one map-side pass — tokenize, build the per-doc start
    list with `sequence` (O(n/stride) entries), slice inside a
    `transform`, then posexplode. No shuffle at all; the row explosion
    factor is ~n/stride and output chunks are independent rows ready
    for downstream hash-partitioned stages. Spread the input first
    (`_doc_spread`) when it arrives as a single parquet partition.

    Determinism: chunk boundaries are pure arithmetic on token
    positions; `sequence(0, n-1, stride)` is guarded for n == 0
    (Spark's sequence DESCENDS on an inverted range).
    """
    if size < 1 or stride < 1:
        raise ValueError("chunk_windows: size and stride must be >= 1")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.cast("int").alias("start_tok"),
            F.slice(toks, s + 1, F.lit(size)).alias("ctoks"),
        ),
    )
    ex = _doc_spread(df, id_col).select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "c")
    )
    return ex.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("c.start_tok").alias("start_tok"),
        F.size("c.ctoks").alias("n_chunk_tokens"),
        F.md5(F.array_join("c.ctoks", " ")).alias("chunk_hash"),
    )
