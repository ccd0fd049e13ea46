from __future__ import annotations

import pyspark.sql.functions as F

from polygon_algotrading_env_spark.catalog import load_table
from polygon_algotrading_env_spark.functions.vectors import (
    cosine,
    dequantize_int8,
    quantize_int8,
)


def test_quantize_roundtrip_error_bound(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    q = emb.select(
        "vec_id",
        "embedding",
        quantize_int8("embedding").alias("q"),
    ).select(
        "vec_id",
        "embedding",
        F.col("q.scale").alias("scale"),
        dequantize_int8("q").alias("back"),
    )
    rows = q.select(
        "scale",
        F.aggregate(
            F.zip_with("embedding", "back", lambda a, b: F.abs(a - b)),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ).alias("max_err"),
    ).collect()
    # Symmetric rounding: per-element error <= scale/2.
    assert all(r["max_err"] <= r["scale"] / 2 + 1e-12 for r in rows)


def test_quantize_zero_vector_and_codes_range(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, -2.0])], "id int, v array<double>"
    )
    out = df.select(
        "id", quantize_int8("v").alias("q")
    ).select("id", "q.codes", "q.scale", dequantize_int8("q").alias("back"))
    rows = {r["id"]: r for r in out.collect()}
    assert list(rows[1]["codes"]) == [0, 0] and rows[1]["scale"] == 0.0
    assert rows[1]["back"] == [0.0, 0.0]
    assert max(abs(c) for c in rows[2]["codes"]) == 127  # max element pins 127
    assert abs(rows[2]["back"][1] - (-2.0)) < 1e-12


def test_quantized_cosine_ranking_preserved(spark, sf_dir):
    """SQ8's contract: cosine ordering is nearly unchanged — top-5 by
    dequantized cosine matches exact top-5 for a probe vector."""
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    qv = list(
        emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"]
    )
    lit = F.array(*[F.lit(float(x)) for x in qv])
    exact = [
        r["vec_id"]
        for r in emb.select("vec_id", cosine("embedding", lit).alias("s"))
        .orderBy(F.desc("s"), "vec_id").limit(5).collect()
    ]
    approx = [
        r["vec_id"]
        for r in emb.select(
            "vec_id", quantize_int8("embedding").alias("q")
        )
        .select("vec_id", cosine(dequantize_int8("q"), lit).alias("s"))
        .orderBy(F.desc("s"), "vec_id").limit(5).collect()
    ]
    assert len(set(exact) & set(approx)) >= 4
