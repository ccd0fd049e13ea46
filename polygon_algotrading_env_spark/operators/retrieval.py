"""Lexical retrieval operators: inverted-index statistics and BM25.

The lexical-search baseline next to the embedding ANN path
(operators/similarity.py). Everything is DataFrame algebra over exploded
tokens — no Python in the hot path — and the statistics relations are
exactly what you would materialize once as the inverted index at corpus
scale (tf/doclen partitioned by bucketed token ranges, rebuilt
incrementally per ingest batch).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from polygon_algotrading_env_spark.functions.text import word_tokens


def term_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Posting-list relation ``(id, token, tf)`` — the inverted index core.
    One explode + one (id, token) hash aggregate (map-side combined)."""
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(word_tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    tf_table: DataFrame | None = None,
) -> DataFrame:
    """BM25 score of every document matching ≥1 query term.

    Returns ``(id, score)`` — callers take ``orderBy(desc).limit(k)`` on
    top (Spark plans TakeOrderedAndProject, no global sort).

    Pass ``tf_table`` (a materialized :func:`term_frequencies` output) to
    probe an existing index; otherwise the index relations are derived in
    the same plan. Either way the probe filters posting lists to the
    query's terms BEFORE any scoring math, so per-query work is
    proportional to the matched postings, and the query-sized df/idf side
    broadcasts.
    """
    terms = [t for t in query_terms if t]
    if not terms:
        raise ValueError("query_terms must contain at least one term")
    tf = (
        tf_table
        if tf_table is not None
        else term_frequencies(docs, id_col, text_col)
    )
    dl = tf.groupBy("id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_ = (
        tf.where(F.col("token").isin(*terms))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    w = idf * (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df_), "token")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
        .groupBy("id")
        .agg(F.sum(w).alias("score"))
    )
