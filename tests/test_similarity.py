from __future__ import annotations

import pyspark.sql.functions as F

from polygon_algotrading_env_spark.catalog import load_table
from polygon_algotrading_env_spark.functions.vectors import cosine, dot, norm
from polygon_algotrading_env_spark.operators.similarity import (
    add_srp_buckets,
    cosine_topk,
    lsh_ann_topk,
)


def test_dot_norm_cosine_expressions(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 2.0], [3.0, 4.0, 0.5])],
        "id int, a array<double>, b array<double>",
    )
    r = df.select(
        dot("a", "b").alias("d"), norm("a").alias("na"), cosine("a", "a").alias("caa")
    ).collect()[0]
    assert r["d"] == 1 * 3 + 0 + 2 * 0.5
    assert abs(r["na"] - 5 ** 0.5) < 1e-12
    assert abs(r["caa"] - 1.0) < 1e-12


def test_topk_self_query_is_first(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"]
    top = cosine_topk(emb, list(q), k=5).collect()
    assert top[0]["vec_id"] == 7
    assert abs(top[0]["score"] - 1.0) < 1e-6
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = list(emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"])
    exact = [r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in lsh_ann_topk(
            emb, q, k=10, n_planes=8, multiprobe_hamming=2
        ).collect()
    ]
    # Approximate search must at least find the query itself plus a
    # reasonable share of the true neighborhood.
    assert 7 in approx
    assert len(set(exact) & set(approx)) >= 3


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    from polygon_algotrading_env_spark.operators.similarity import (
        ivf_centroids,
        ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = list(emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"])
    cents = ivf_centroids(emb, n_centroids=8)
    exact = [r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()]
    approx = [
        r["vec_id"] for r in ivf_topk(emb, q, cents, k=10, n_probe=3).collect()
    ]
    assert 7 in approx
    assert len(set(exact) & set(approx)) >= 4
    # n_probe = n_centroids degenerates to the exact scan.
    full = [
        r["vec_id"] for r in ivf_topk(emb, q, cents, k=10, n_probe=8).collect()
    ]
    assert full == exact


def test_srp_arrow_bucket_equals_expression_bucket(spark, sf_dir):
    """The vectorized (Arrow matmul) bulk assignment and the pure-expression
    per-query path must agree row-for-row — the single-source-of-truth
    guarantee that lets the query bucket be computed without the index."""
    from polygon_algotrading_env_spark.operators.similarity import srp_bucket

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    both = add_srp_buckets(emb, n_planes=8, seed=7).withColumn(
        "bucket_expr", srp_bucket(F.col("embedding"), n_planes=8, seed=7)
    )
    mismatched = both.filter(F.col("bucket") != F.col("bucket_expr")).count()
    assert mismatched == 0


def test_srp_buckets_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    a = add_srp_buckets(emb, n_planes=8, seed=1).select("vec_id", "bucket")
    b = add_srp_buckets(emb, n_planes=8, seed=1).select("vec_id", "bucket")
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
    assert a.filter((F.col("bucket") < 0) | (F.col("bucket") >= 2 ** 8)).count() == 0


def test_srp_index_probe_equals_scan_and_prunes(spark, sf_dir, tmp_path):
    """The materialized-index probe must return exactly the scan variant's
    result AND its physical plan must be a partition-pruned read (the
    bucket predicate reaches PartitionFilters; nothing rescans the
    relation)."""
    from polygon_algotrading_env_spark.operators.similarity import (
        build_srp_index,
        lsh_ann_topk_indexed,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = list(emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"])
    idx = str(tmp_path / "srp_index")
    build_srp_index(emb, idx, n_planes=8)
    scan = lsh_ann_topk(emb, q, k=10, n_planes=8, multiprobe_hamming=1)
    probe = lsh_ann_topk_indexed(
        spark, idx, q, k=10, n_planes=8, multiprobe_hamming=1
    )
    assert [tuple(r) for r in probe.collect()] == [
        tuple(r) for r in scan.collect()
    ]
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "bucket" in plan


def test_srp_quantized_index_recall(spark, sf_dir, tmp_path):
    """SQ8 index (4× smaller probe scan) must preserve the ANN result:
    top-k from the quantized index matches the float index on ≥ k-1 of
    k ids, and the index actually stores codes+scale, not float arrays."""
    from polygon_algotrading_env_spark.operators.similarity import (
        build_srp_index,
        lsh_ann_topk_indexed,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = list(emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"])
    fidx, qidx = str(tmp_path / "f"), str(tmp_path / "q")
    build_srp_index(emb, fidx, n_planes=8)
    build_srp_index(emb, qidx, n_planes=8, quantize=True)
    schema = spark.read.parquet(qidx).schema["embedding"].dataType.simpleString()
    assert "codes" in schema and "tinyint" in schema
    full = [r["vec_id"] for r in lsh_ann_topk_indexed(
        spark, fidx, q, k=10, n_planes=8).collect()]
    quant = [r["vec_id"] for r in lsh_ann_topk_indexed(
        spark, qidx, q, k=10, n_planes=8).collect()]
    assert 7 in quant
    assert len(set(full) & set(quant)) >= 9


def test_ivf_index_probe_equals_scan_no_udf_in_plan(spark, sf_dir, tmp_path):
    """IVF indexed probe ≡ scan variant, with PartitionFilters on cell and
    NO Arrow assignment UDF anywhere in the probe plan — the O(n·d)
    assignment happened once at build time."""
    from polygon_algotrading_env_spark.operators.similarity import (
        build_ivf_index,
        ivf_centroids,
        ivf_topk,
        ivf_topk_indexed,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = list(emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"])
    cents = ivf_centroids(emb, n_centroids=8)
    idx = str(tmp_path / "ivf_index")
    build_ivf_index(emb, idx, cents)
    scan = ivf_topk(emb, q, cents, k=10, n_probe=3)
    probe = ivf_topk_indexed(spark, idx, q, cents, k=10, n_probe=3)
    assert [tuple(r) for r in probe.collect()] == [
        tuple(r) for r in scan.collect()
    ]
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_ivf_centroids_unbiased_under_partition_skew(spark, sf_dir):
    """Quantizer training must survive a clustered ingest layout: with the
    data range-partitioned by label (each partition ≈ one label's cluster),
    a head-of-first-partition sample would train centroids on one shard and
    recall would collapse. The seeded uniform sample must not."""
    from polygon_algotrading_env_spark.operators.similarity import (
        ivf_centroids,
        ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    skewed = emb.repartitionByRange(8, "label", "vec_id")
    # Force sampling path (sample_rows < corpus size).
    n = emb.count()
    cents = ivf_centroids(skewed, n_centroids=8, sample_rows=max(64, n // 4))
    # Probe with a query from the LAST label partition — the rows a
    # limit()-based sample would never have seen.
    last_label = emb.agg(F.max("label")).collect()[0][0]
    probe_id = (
        emb.filter(F.col("label") == last_label)
        .agg(F.max("vec_id"))
        .collect()[0][0]
    )
    q = list(
        emb.filter(F.col("vec_id") == probe_id).collect()[0]["embedding"]
    )
    exact = [r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in ivf_topk(skewed, q, cents, k=10, n_probe=3).collect()
    ]
    assert probe_id in approx
    assert len(set(exact) & set(approx)) >= 4


def test_semantic_dup_pairs_and_survivors(spark):
    from polygon_algotrading_env_spark.operators.graph import (
        connected_components,
    )
    from polygon_algotrading_env_spark.operators.similarity import (
        semantic_dup_pairs,
    )

    # v1 ≈ v2 (same direction), v3 orthogonal, v4 ≈ v1 but other block.
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.999, 0.01], 0),
        (3, [0.0, 1.0], 0),
        (4, [1.0, 0.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id int, embedding array<double>, label int"
    )
    pairs = semantic_dup_pairs(emb, threshold=0.95, block_col="label")
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(1, 2)}  # 4 matches 1 in cosine but is blocked apart

    labels = connected_components(
        pairs.selectExpr("id_a as src", "id_b as dst"),
        vertices=emb.selectExpr("vec_id as id"),
    )
    comp = {r["id"]: r["component"] for r in labels.collect()}
    assert comp == {1: 1, 2: 1, 3: 3, 4: 4}

    # unblocked: cross-block pair appears
    all_pairs = semantic_dup_pairs(emb, threshold=0.95)
    got_all = {(r["id_a"], r["id_b"]) for r in all_pairs.collect()}
    assert got_all == {(1, 2), (1, 4), (2, 4)}


def test_pq_adc_recall_and_determinism(spark):
    """PQ pipeline: codebooks train on a seeded sample, codes are m small
    ints (the ~100-400x memory win), and ADC top-k over the CODES
    relation recovers the brute-force cosine neighbors with high recall
    on clustered data. Encoding is deterministic across partitionings."""
    import numpy as np
    import pyspark.sql.functions as F

    from polygon_algotrading_env_spark.operators.similarity import (
        cosine_topk,
        pq_encode,
        pq_topk,
        pq_topk_reranked,
        pq_train,
    )

    rng = np.random.RandomState(3)
    centers = rng.randn(8, 32) * 5
    rows = []
    for i in range(800):
        c = centers[i % 8]
        rows.append((i, (c + rng.randn(32) * 0.3).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    query = (centers[2] + rng.randn(32) * 0.1).tolist()

    books = pq_train(df, m=4, codebook_size=64, sample_rows=800, seed=7)
    assert books.shape == (4, 64, 8)
    codes = pq_encode(df, books)
    row0 = codes.orderBy("vec_id").first()
    assert len(row0["pq_code"]) == 4

    # ADC alone must put the candidates in the right CLUSTER (coarse
    # recall); exact ranks come from the two-stage re-ranked query.
    cand = [
        r["vec_id"] for r in pq_topk(codes, books, query, k=100).collect()
    ]
    assert sum(1 for i in cand if i % 8 == 2) >= 90, cand[:20]
    exact = [r["vec_id"] for r in cosine_topk(df, query, k=20).collect()]
    reranked = [
        r["vec_id"]
        for r in pq_topk_reranked(
            codes, df, books, query, k=20, n_candidates=100
        ).collect()
    ]
    recall = len(set(reranked) & set(exact)) / 20.0
    assert recall >= 0.9, (recall, reranked, exact)

    again = pq_encode(df.repartition(7), books)
    a = {r["vec_id"]: list(r["pq_code"]) for r in codes.collect()}
    b = {r["vec_id"]: list(r["pq_code"]) for r in again.collect()}
    assert a == b


def test_md5_srp_bucket_matches_pure_python(spark, sf_dir):
    """The oracle-certified SRP tier rests on md5-derived hyperplanes being
    bit-identical across engines; pin the Spark expression against a pure-
    Python recomputation (hashlib md5 + sequential fold, the same spec the
    DuckDB oracle implements in SQL)."""
    import hashlib

    from polygon_algotrading_env_spark.catalog import load_table
    from polygon_algotrading_env_spark.queries.vectors import (
        _md5_planes,
        _srp_bucket_expr,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    rows = emb.collect()
    dim = len(rows[0]["embedding"])
    planes = _md5_planes(6, dim)
    got = {
        r["vec_id"]: r["bucket"]
        for r in emb.select(
            "vec_id", _srp_bucket_expr(planes).alias("bucket")
        ).collect()
    }
    for r in rows:
        expect = 0
        for p, hv in enumerate(planes):
            acc = 0.0
            for x, y in zip(r["embedding"], hv):
                acc += float(x) * y
            if acc >= 0:
                expect |= 1 << p
        assert got[r["vec_id"]] == expect
    # and the plane constants really are the md5 spec
    assert planes[2][3] == (
        int(hashlib.md5(b"srp|2|3").hexdigest()[:8], 16) / 4294967295.0 * 2 - 1
    )
