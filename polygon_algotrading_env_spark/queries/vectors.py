"""Embedding / array-column queries (extension surface: similarity search
for training-data pipelines).

Scores are computed in double and rounded to 6 decimals on both engine
sides: accumulation order is sequential in both (Spark ``aggregate`` higher-
order fold, DuckDB list functions), so rounded values match.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from polygon_algotrading_env_spark.catalog import load_table
from polygon_algotrading_env_spark.functions.vectors import cosine, dot, norm
from polygon_algotrading_env_spark.operators.similarity import (
    add_srp_buckets,
    cosine_topk,
    lsh_ann_topk,
    pairwise_cosine_topk,
)
from polygon_algotrading_env_spark.queries import register


# --- array explode (engine array/JSON surface, SURVEY §2.9 note) ----------
@register(
    "explode_embedding_head",
    oracle="""
    SELECT vec_id, CAST(pos AS INT) AS pos, CAST(val AS DOUBLE) AS val
    FROM (
      SELECT vec_id,
             generate_subscripts(embedding, 1) - 1 AS pos,
             unnest(embedding)                     AS val
      FROM embeddings
    )
    WHERE pos < 8
    """,
)
def explode_embedding_head(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .filter(F.col("pos") < 8)
        .select("vec_id", F.col("pos").cast("int"), F.col("val").cast("double"))
    )


# --- vector norms (aggregate/zip_with JVM-side math) ----------------------
@register(
    "embedding_norms",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
    FROM embeddings
    """,
)
def embedding_norms(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.round(norm("embedding"), 6).alias("l2_norm")
    )


def _query_vec(spark, sf_dir) -> list[float]:
    """Deterministic probe vector: embedding of vec_id = 0."""
    row = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0]
    )
    return list(row["embedding"])


_TOPK_ORACLE = """
    SELECT vec_id, round(score, 6) AS score FROM (
      SELECT e.vec_id,
             list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                              q.qv)
             / (sqrt(list_sum(list_transform(e.embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS score
      FROM embeddings e,
           (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
            FROM embeddings WHERE vec_id = 0) q
    )
    ORDER BY round(score, 6) DESC, vec_id ASC LIMIT 20
"""


@register("cosine_topk_bruteforce", headline=True, oracle=_TOPK_ORACLE)
def cosine_topk_bruteforce(spark, sf_dir):
    """Exact cosine top-20 to a probe vector — the ANN baseline. Planned as
    a single scan + TakeOrderedAndProject (per-partition heaps, no global
    sort)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, _query_vec(spark, sf_dir), k=20)


@register("lsh_ann_topk", headline=True, oracle=None)
def lsh_ann_topk_q(spark, sf_dir):
    """SRP-LSH approximate top-k: scores only the probe bucket's Hamming-1
    neighborhood. Approximate ⇒ rows-only check; recall is asserted against
    the brute-force result in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_ann_topk(
        emb, _query_vec(spark, sf_dir), k=20, n_planes=10, multiprobe_hamming=1
    )


@register("ivf_ann_topk", headline=True, oracle=None)
def ivf_ann_topk(spark, sf_dir):
    """IVF-bucketed ANN: spherical-k-means coarse quantizer (trained on a
    driver sample), distributed cell assignment, n_probe-cell scan.
    Approximate ⇒ rows-only; recall asserted vs brute force in tests."""
    from polygon_algotrading_env_spark.operators.similarity import (
        ivf_centroids,
        ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_centroids(emb, n_centroids=16)
    return ivf_topk(emb, _query_vec(spark, sf_dir), cents, k=20, n_probe=4)


@register(
    "embedding_neighbors_blocked",
    oracle="""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ),
    s AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS score
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id != b.vec_id
    ),
    r AS (
      SELECT id_a, id_b, score,
             row_number() OVER (PARTITION BY id_a
                                ORDER BY score DESC, id_b ASC) AS rank
      FROM s
    )
    SELECT id_a, id_b, score, CAST(rank AS INT) AS rank FROM r WHERE rank <= 3
    """,
)
def embedding_neighbors_blocked(spark, sf_dir):
    """All-pairs top-3 neighbors within ``label`` blocks (embedding-cosine
    near-dup). Blocked equi-join, not a cross join; ties at the round-6
    score grid break deterministically by neighbor id on both engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    return pairwise_cosine_topk(emb, k=3, block_col="label")
