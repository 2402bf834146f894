"""Full-text retrieval over the document corpus: Okapi BM25 top-k.

Extends the reference's text surface (StringOps/StringOps.cpp tokenize
+ REGEXP kernels; the tf-idf weighting mirror of
TableFunctionsMatrix.hpp:403-421 idf_normalize lives in
operators/similarity.py) with ranked retrieval — the lookup a
training-data pipeline runs for retrieval-based decontamination and
quality-by-example selection ("find corpus documents most like this
benchmark/query text").

Scale design (100 TB):
- The query term set is SMALL (a handful of terms), so per-document
  term frequencies are computed MAP-SIDE as
  ``size(filter(tokens, x -> x = term))`` — one codegen'd expression
  per term, no explode, no shuffle for the tf stage at all.
- Corpus statistics (N, avgdl, per-term document frequencies) reduce
  to ONE row via a single map-side-combinable aggregate, then rejoin
  as a broadcast — shuffle bytes are O(1) regardless of corpus size.
- The final ranking is an ``ORDER BY ... LIMIT k`` → Spark's
  TakeOrderedAndProject (per-partition top-k, then a k-row merge on
  the driver); no global sort is materialized.
So the whole operator is two column-pruned scans (one for stats, one
for scoring) and O(k) result movement — no wide shuffle anywhere.

Determinism: scores are rounded to 4dp with the half-up floor trick
(portable across engines, see tests/conftest.py hazards) and ranking
ties break on doc_id, so the top-k cut is engine-independent.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

# Okapi BM25 with the Lucene idf form (always positive):
#   idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
#   score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
_TOKEN_SPLIT = "[^a-z0-9]+"


def _eq(term: str):
    # single-arg lambda factory: a `lambda x, t=term:` default would be
    # seen by PySpark as a TWO-arg (element, index) lambda and the
    # index would shadow the term.
    return lambda x: x == F.lit(term)


def _tokens(text_col: str):
    toks = F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT)
    return F.filter(toks, lambda x: x != F.lit(""))


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 25,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 score for `query_terms`.

    Returns (id_col, n_matched, score) ordered by (score DESC, id) —
    `n_matched` is how many distinct query terms the document contains,
    `score` is the 4dp-rounded BM25 total. Documents matching no term
    are excluded.
    """
    terms = [t.lower() for t in query_terms]
    if not terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    tf_cols = [f"tf_{i}" for i in range(len(terms))]

    base = docs.select(
        F.col(id_col),
        _tokens(text_col).alias("toks"),
    ).select(
        id_col,
        F.size("toks").alias("dl"),
        *[
            F.size(F.filter(F.col("toks"), _eq(t))).alias(c)
            for c, t in zip(tf_cols, terms)
        ],
    )

    # One row of corpus statistics; map-side combinable, O(1) shuffle.
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(c) > 0).cast("long")).alias(f"df_{i}")
            for i, c in enumerate(tf_cols)
        ],
    )

    scored = base.join(F.broadcast(stats))
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    parts = []
    for i, c in enumerate(tf_cols):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        parts.append(
            idf * F.col(c) * F.lit(k1 + 1.0) / (F.col(c) + norm)
        )
    total = parts[0]
    for p in parts[1:]:
        total = total + p
    n_matched = None
    for c in tf_cols:
        m = (F.col(c) > 0).cast("int")
        n_matched = m if n_matched is None else n_matched + m

    return (
        scored.select(
            id_col,
            n_matched.alias("n_matched"),
            (F.floor(total * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4))
            .alias("score"),
        )
        .filter(F.col("n_matched") > 0)
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def bm25_oracle_sql(
    query_terms: Sequence[str],
    k: int = 25,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
) -> str:
    """DuckDB oracle computing the identical BM25 top-k (doubles forced
    with e-notation so DuckDB never falls into DECIMAL arithmetic)."""
    terms = [t.lower() for t in query_terms]
    tf_defs = ",\n               ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_defs = ",\n               ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    norm = f"{k1!r} * ((1.0e0 - {b!r}) + {b!r} * dl / avgdl)"
    score = " + ".join(
        f"ln(1.0e0 + (n_docs - df_{i} + 0.5e0) / (df_{i} + 0.5e0))"
        f" * tf_{i} * {k1 + 1.0!r} / (tf_{i} + {norm})"
        for i in range(len(terms))
    )
    matched = " + ".join(
        f"CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END"
        for i in range(len(terms))
    )
    return f"""
    WITH tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text),
                   '{_TOKEN_SPLIT}'), x -> x <> '') AS toks
        FROM {table}
    ), base AS (
        SELECT doc_id, len(toks) AS dl,
               {tf_defs}
        FROM tok
    ), stats AS (
        SELECT count(*) AS n_docs, avg(dl) AS avgdl,
               {df_defs}
        FROM base
    )
    SELECT doc_id,
           CAST({matched} AS INTEGER) AS n_matched,
           floor(({score}) * 1.0e4 + 0.5e0) / 1.0e4 AS score
    FROM base CROSS JOIN stats
    WHERE {matched} > 0
    ORDER BY score DESC, doc_id
    LIMIT {k}
    """


def hybrid_rerank(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: Sequence[str],
    query_vec,
    m: int = 100,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid retrieval: BM25 lexical candidates re-ranked by embedding
    cosine — the two-stage recall/precision lookup of retrieval-based
    decontamination and quality-by-example selection (cheap lexical
    recall over the whole corpus, dense rerank of only m candidates).

    Returns (id_col, bm25, cos_sim) — the top-k of the m BM25
    candidates by (cos_sim DESC, id).

    100 TB shape: stage 1 is bm25_topk (O(1) shuffle, O(m) result);
    stage 2 BROADCASTS the m-row candidate set against the embedding
    table — a broadcast hash join, never a shuffle of the embeddings —
    then one O(d) cosine per candidate row and a k-row TakeOrdered.
    """
    from heavydb_spark.operators.similarity import (  # local: avoid cycle
        _vec_lit,
        cosine_similarity,
    )

    cand = bm25_topk(
        docs, query_terms, k=m, text_col=text_col, id_col=id_col
    ).select(F.col(id_col), F.col("score").alias("bm25"))
    qv = _vec_lit(query_vec)
    return (
        embeddings.join(
            F.broadcast(cand), F.col(vec_id_col) == F.col(id_col)
        )
        .select(
            id_col,
            "bm25",
            F.round(cosine_similarity(F.col(vec_col), qv), 6).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def hybrid_oracle_sql(
    query_terms: Sequence[str],
    m: int = 100,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB oracle for hybrid_rerank with query vector = vec_id 0's
    embedding (the catalog convention, see queries/datapipe.py
    _query_vec)."""
    inner = bm25_oracle_sql(query_terms, k=m, k1=k1, b=b)
    return f"""
    WITH cand AS ({inner}),
    q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id = 0
    )
    SELECT c.doc_id, c.score AS bm25,
           round(list_dot_product(CAST(e.embedding AS DOUBLE[]), qv)
                 / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
    FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id, q
    ORDER BY cos_sim DESC, c.doc_id LIMIT {k}
    """
