from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from polygon_algotrading_env_spark.operators.dedup import (
    dedup_keep_first,
    exact_dedup,
    hamming64,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash64,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the rain "
        "in spain stays mainly in the plain and the cat sat on the mat"
    )
    near = base.replace("lazy dog", "sleepy dog")  # near-duplicate of 0
    other = (
        "completely different content about distributed query engines "
        "columnar storage vectorized execution and shuffle services"
    )
    rows = [(0, base), (1, near), (2, other), (3, base)]  # 3 = exact dup of 0
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_idempotent(spark, docs):
    once = exact_dedup(docs.select("text"))
    twice = exact_dedup(once)
    assert once.count() == 3
    assert twice.count() == 3


def test_dedup_keep_first_deterministic(spark, docs):
    out = dedup_keep_first(docs, keys=["text"], order_col="doc_id")
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [0, 1, 2]  # doc 3 loses to doc 0 on the same text


def test_minhash_finds_near_and_exact_dups(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_candidate_pairs(docs, num_hashes=32, bands=16).collect()
    }
    assert pairs.get((0, 3)) == 1.0           # exact dup → identical signature
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.4
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_ngram_jaccard_exact_verification(spark, docs):
    cands = minhash_candidate_pairs(docs, num_hashes=32, bands=16).select(
        "id_a", "id_b"
    )
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(cands, docs).collect()
    }
    assert jac[(0, 3)] == 1.0
    assert 0.5 < jac[(0, 1)] < 1.0


def test_winnowing_detects_partial_overlap(spark):
    from polygon_algotrading_env_spark.operators.dedup import winnow_candidate_pairs

    shared = "this exact long passage is copied verbatim between documents"
    rows = [
        (0, f"unique preamble alpha alpha alpha. {shared}. unique tail one"),
        (1, f"completely different opening text here. {shared}. other ending"),
        (2, "no overlap with the others at all, entirely distinct content x"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["shared_fps"]
        for r in winnow_candidate_pairs(docs, k=8, window=12, min_shared=2).collect()
    }
    assert (0, 1) in pairs  # shared region found despite different docs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_simhash_hamming(spark, docs):
    sh = docs.select("doc_id", simhash64("text").alias("h"))
    a = sh.alias("a").join(sh.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
    dist = {
        (r["ida"], r["idb"]): r["d"]
        for r in a.select(
            F.col("a.doc_id").alias("ida"),
            F.col("b.doc_id").alias("idb"),
            hamming64(F.col("a.h"), F.col("b.h")).alias("d"),
        ).collect()
    }
    assert dist[(0, 3)] == 0                   # exact dup → same fingerprint
    assert dist[(0, 1)] < dist[(0, 2)]         # near-dup closer than unrelated
    assert dist[(0, 1)] <= 10
