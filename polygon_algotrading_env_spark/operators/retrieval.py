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
    probe an existing index; otherwise the probe-relevant slice of the
    index is derived in the same plan. Plan shape either way:

    - document lengths are a pure PROJECTION (``size(word_tokens)``,
      restricted to non-empty docs) — never a corpus-wide aggregate;
    - the ``token IN (query)`` filter sits BELOW the tf aggregate, so the
      only (id, token) shuffle carries the query's postings, not the
      corpus's, and AQE broadcasts that filtered side into the dl join —
      the full corpus is scanned but never shuffled;
    - the query-sized df/idf and 1-row stats sides broadcast.
    """
    terms = [t for t in query_terms if t]
    if not terms:
        raise ValueError("query_terms must contain at least one term")
    if tf_table is not None:
        tf = tf_table.where(F.col("token").isin(*terms))
    else:
        tf = (
            docs.select(
                F.col(id_col).alias("id"),
                F.explode(word_tokens(F.col(text_col))).alias("token"),
            )
            .where(F.col("token").isin(*terms))
            .groupBy("id", "token")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
    dl = docs.select(
        F.col(id_col).alias("id"),
        F.size(word_tokens(F.col(text_col))).alias("dl"),
    ).where(F.col("dl") > 0)
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
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


def phrase_occurrences(
    docs: DataFrame,
    phrase: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact positional phrase search: documents containing the token
    sequence ``phrase`` at consecutive positions, as ``(id, n_matches,
    first_pos)`` with 1-based first match position — the inverted-index
    operation BM25's bag-of-words scoring cannot express.

    Plan (the classic positional-postings intersection): the token
    relation is FILTERED to the phrase's terms before anything joins —
    the pushed ``token = term_i`` predicates shrink each side to that
    term's postings — then term i joins term 0 on ``(id, pos − i)``
    equality. Every join is an equi-join between phrase-term posting
    lists (corpus-frequency-sized, not corpus-sized); AQE broadcasts the
    rarest term's side. No window, no self-join of the full token
    relation."""
    if len(phrase) < 2:
        raise ValueError("phrase needs >= 2 terms")
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(word_tokens(F.col(text_col))).alias("pos", "token"),
    )
    base = toks.where(F.col("token") == phrase[0]).select("id", "pos")
    for i, term in enumerate(phrase[1:], start=1):
        nxt = toks.where(F.col("token") == term).select(
            "id", (F.col("pos") - i).alias("pos")
        )
        base = base.join(nxt, ["id", "pos"])
    return base.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        (F.min("pos") + 1).cast("bigint").alias("first_pos"),
    )
