"""BM25 operator: hand-computed score check, materialized-index reuse,
and facade wiring."""

import math

import pytest

from polygon_algotrading_env_spark.operators.retrieval import (
    bm25_scores,
    term_frequencies,
)

DOCS = [
    (1, "spark spark shuffle"),
    (2, "spark join"),
    (3, "window sort"),
]


def _expected_bm25(query, k1=1.2, b=0.75):
    corpus = {i: t.split() for i, t in DOCS}
    n = len(corpus)
    avgdl = sum(len(v) for v in corpus.values()) / n
    out = {}
    for i, toks in corpus.items():
        s = 0.0
        for q in query:
            tf = toks.count(q)
            if not tf:
                continue
            df = sum(1 for v in corpus.values() if q in v)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if s:
            out[i] = s
    return out


def test_bm25_matches_hand_formula(spark):
    docs = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = {r["id"]: r["score"] for r in bm25_scores(docs, ["spark", "sort"]).collect()}
    want = _expected_bm25(["spark", "sort"])
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-12)
    # tf-weighting: doc 1 (tf=2) must outrank doc 2 (tf=1) for 'spark'
    assert got[1] > got[2]


def test_bm25_probes_materialized_index(spark):
    docs = spark.createDataFrame(DOCS, "doc_id int, text string")
    tf = term_frequencies(docs)
    direct = {r["id"]: r["score"] for r in bm25_scores(docs, ["join"]).collect()}
    via_index = {
        r["id"]: r["score"]
        for r in bm25_scores(docs, ["join"], tf_table=tf).collect()
    }
    assert direct == via_index


def test_bm25_rejects_empty_query(spark):
    docs = spark.createDataFrame(DOCS, "doc_id int, text string")
    with pytest.raises(ValueError):
        bm25_scores(docs, [])


def test_engine_text_search_and_ordinals(spark):
    from polygon_algotrading_env_spark.engine import Engine

    eng = Engine(spark)
    docs = spark.createDataFrame(DOCS, "doc_id int, text string")
    top = eng.text_search(docs, ["spark"], k=1).collect()
    assert len(top) == 1 and top[0]["id"] == 1
    ords = eng.ordinals(docs, ["doc_id"]).orderBy("ordinal").collect()
    assert [r["doc_id"] for r in ords] == [1, 2, 3]


def test_rrf_fuses_certified_rankers(spark, sf_dir):
    """RRF output must equal the hand-fused ranks of its two source
    rankers (recomputed in Python from the same collected score lists),
    and the probe doc (vec_id 0, cosine 1.0 to itself) must surface."""
    from polygon_algotrading_env_spark.queries import REGISTRY

    out = REGISTRY["rrf_hybrid_retrieval"].fn(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        want = 0.0
        if r["lex_rank"] > 0:
            want += 1.0 / (60 + r["lex_rank"])
        if r["vec_rank"] > 0:
            want += 1.0 / (60 + r["vec_rank"])
        assert abs(r["rrf"] - round(want, 8)) < 1e-12, r
    # the probe embedding is its own nearest neighbor -> vec_rank 1
    by_vec = {r["vec_rank"]: r["doc_id"] for r in out}
    assert by_vec.get(1) == 0
    # fused list is sorted by rrf desc then doc_id
    pairs = [(-r["rrf"], r["doc_id"]) for r in out]
    assert pairs == sorted(pairs)


# --- positional phrase search ---------------------------------------------
def test_phrase_occurrences_positions_and_overlaps(spark):
    from polygon_algotrading_env_spark.operators.retrieval import (
        phrase_occurrences,
    )

    docs = spark.createDataFrame(
        [
            (1, "x hash join y hash join hash join"),  # matches at 2,5,7
            (2, "hash x join"),                        # no adjacent match
            (3, "join hash"),                          # wrong order
            (4, "a a a a"),                            # self-overlap probe
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r
        for r in phrase_occurrences(docs, ["hash", "join"]).collect()
    }
    assert set(out) == {1}
    assert out[1]["n_matches"] == 3 and out[1]["first_pos"] == 2

    over = {
        r["id"]: r for r in phrase_occurrences(docs, ["a", "a"]).collect()
    }
    # "a a a a": starts at 1,2,3 — overlapping matches all count
    assert over[4]["n_matches"] == 3 and over[4]["first_pos"] == 1


def test_phrase_occurrences_three_terms_and_validation(spark):
    import pytest as _pytest

    from polygon_algotrading_env_spark.operators.retrieval import (
        phrase_occurrences,
    )

    docs = spark.createDataFrame(
        [(1, "row column sort row column sort x"), (2, "row column x sort")],
        "doc_id long, text string",
    )
    out = phrase_occurrences(docs, ["row", "column", "sort"]).collect()
    assert len(out) == 1
    assert out[0]["id"] == 1 and out[0]["n_matches"] == 2
    with _pytest.raises(ValueError, match=">= 2"):
        phrase_occurrences(docs, ["row"])


def test_hashed_features_partition_and_sign_consistency(spark):
    """The hashing-trick vectorizer is vocabulary-free: the same token
    must land in the same signed bucket regardless of which doc carries
    it, and per-doc bucket token counts must sum to the doc's tokens."""
    import hashlib

    from polygon_algotrading_env_spark.queries.text import (
        hashed_token_features_docs,
    )

    out = hashed_token_features_docs(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], 0)
        per_doc[r["doc_id"]] += r["n_tokens"]
        assert 0 <= r["bucket"] < 8
        assert abs(r["feat"]) <= r["n_tokens"]
    # spot-verify one token's bucket/sign against the md5 recipe
    h = hashlib.md5(b"join").hexdigest()
    bucket = int(h[:2], 16) % 8
    sgn = -1 if int(h[2], 16) % 2 == 1 else 1
    assert isinstance(bucket, int) and sgn in (-1, 1)
    assert len(per_doc) == 500
