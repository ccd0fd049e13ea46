"""Corpus frequency model — operators/corpus.py."""

from __future__ import annotations

from polygon_algotrading_env_spark.operators.corpus import (
    doc_rarity_scores,
    token_doc_frequency,
)


def test_token_doc_frequency_distinct_per_doc(spark):
    docs = spark.createDataFrame(
        [(1, "the cat the cat"), (2, "the dog"), (3, "")],
        "doc_id int, text string",
    )
    model = {r["token"]: r["df"] for r in token_doc_frequency(docs).collect()}
    # 'the' counts once per doc despite repetition inside doc 1.
    assert model == {"the": 2, "cat": 1, "dog": 1}


def test_doc_rarity_scores_integers(spark):
    docs = spark.createDataFrame(
        [(1, "the cat"), (2, "the dog"), (3, "zyzzyva")],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: (r["sum_df"], r["n_model_tokens"])
        for r in doc_rarity_scores(docs).collect()
    }
    # the=2, cat=1, dog=1, zyzzyva=1
    assert got == {1: (3, 2), 2: (3, 2), 3: (1, 1)}


def test_external_reference_model(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "qqq zzz")], "doc_id int, text string"
    )
    ref = spark.createDataFrame(
        [(10, "alpha alpha"), (11, "alpha")], "doc_id int, text string"
    )
    model = token_doc_frequency(ref)
    got = {
        r["doc_id"]: (r["sum_df"], r["n_model_tokens"])
        for r in doc_rarity_scores(docs, model=model).collect()
    }
    # INNER-join semantics (matches the certified oracle): alpha df=2 from
    # the reference corpus; out-of-model 'beta' counts toward NEITHER
    # sum_df nor n_model_tokens; doc 2 (all tokens OOV) has no row.
    assert got == {1: (2, 1)}
