"""Quantized k-means: the distributed fixed-round Lloyd must reproduce a
straight-Python implementation of the identical rules (md5 seeding,
exact-integer distances, smallest-cid tie-break, truncating-division
updates, empty-cluster carryover) — and the rules themselves get unit
coverage."""

from __future__ import annotations

import hashlib

from polygon_algotrading_env_spark.operators.clustering import (
    _truncdiv,
    kmeans_quantized,
)


def test_truncdiv_matches_duckdb_semantics():
    import duckdb

    con = duckdb.connect()
    for s, n in [(-7, 2), (7, 2), (-8, 2), (0, 5), (-1, 3), (10**12 + 7, 9)]:
        want = con.execute(f"SELECT CAST({s} AS BIGINT) // {n}").fetchone()[0]
        assert _truncdiv(s, n) == want, (s, n)


def _reference_kmeans(vecs: dict[int, list[float]], k: int, n_rounds: int):
    scale = 1 << 20
    import math

    q = {
        i: [math.floor(float(x) * scale) for x in v] for i, v in vecs.items()
    }
    order = sorted(q, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = [list(q[i]) for i in order[:k]]

    def assign():
        out = {}
        for i, v in q.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(v, cv)), ci)
                for ci, cv in enumerate(cents)
            )
            out[i] = (best[1], best[0])
        return out

    for _ in range(n_rounds):
        a = assign()
        for ci in range(k):
            members = [q[i] for i, (c, _) in a.items() if c == ci]
            if not members:
                continue
            cents[ci] = [
                _truncdiv(sum(col), len(members)) for col in zip(*members)
            ]
    return assign(), cents


def test_kmeans_matches_python_reference(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {
        r["vec_id"]: list(r["embedding"]) for r in emb.collect()
    }
    want_assign, want_cents = _reference_kmeans(vecs, k=8, n_rounds=3)

    final, cents = kmeans_quantized(emb, k=8, n_rounds=3)
    assert cents == want_cents
    got = {r["vec_id"]: (r["cid"], r["dist"]) for r in final.collect()}
    assert got == want_assign


def test_kmeans_partition_invariance(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _, c1 = kmeans_quantized(emb, k=4, n_rounds=2)
    _, c2 = kmeans_quantized(emb.repartition(13), k=4, n_rounds=2)
    assert c1 == c2


def test_kmeans_tiebreak_prefers_smallest_cid(spark):
    """Two identical seed points: every vector is equidistant to both
    centroids, so everything must land on the smaller cid."""
    import pandas as pd

    rows = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3],
            "embedding": [[0.5, 0.5]] * 4,
            "label": 0,
        }
    )
    emb = spark.createDataFrame(rows)
    final, cents = kmeans_quantized(emb, k=2, n_rounds=1)
    out = final.collect()
    assert {r["cid"] for r in out} == {0}
    assert all(r["dist"] == 0 for r in out)
    # the empty cluster kept its (identical) seed centroid
    assert cents[0] == cents[1]


def test_gram_matrix_matches_numpy(spark, sf_dir):
    """The distributed Gram query vs numpy's X'X on the same quantized
    matrix — exact integer equality, upper triangle complete."""
    import math

    import numpy as np

    from polygon_algotrading_env_spark.queries import REGISTRY

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    X = np.array(
        [
            [math.floor(float(x) * (1 << 20)) for x in r["embedding"]]
            for r in sorted(emb, key=lambda r: r["vec_id"])
        ],
        dtype=object,  # exact Python ints, no int64 overflow ambiguity
    )
    G = X.T @ X
    rows = REGISTRY["embedding_gram_matrix"].fn(spark, sf_dir).collect()
    dim = X.shape[1]
    assert len(rows) == dim * (dim + 1) // 2
    for r in rows:
        assert r["g"] == int(G[r["i"], r["j"]]), (r["i"], r["j"])
