"""Overlapping-window chunker: the emitted chunks must tile each document
exactly the way the canonical sliding-window loop does (emit while the
window starts in the doc and the previous window didn't reach the end)."""

from __future__ import annotations

from polygon_algotrading_env_spark.queries import REGISTRY

SIZE, STRIDE = 32, 24


def _reference_chunks(text: str) -> list[tuple[int, int, int, str]]:
    toks = text.strip().split()
    if not toks:
        toks = [""]
    out, start, idx = [], 0, 0
    while True:
        chunk = toks[start : start + SIZE]
        out.append((start // STRIDE, start, len(chunk), " ".join(chunk)))
        if start + SIZE >= len(toks):
            break
        start += STRIDE
        idx += 1
    return out


def test_chunks_match_reference_loop(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    rows = REGISTRY["chunk_docs_overlap"].fn(spark, sf_dir).collect()
    got: dict[int, list] = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["start_token"], r["n_chunk_tokens"], r["chunk_text"])
        )
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        assert sorted(got[doc_id]) == _reference_chunks(text), doc_id


def test_chunk_boundaries_hand_cases(spark):
    import pandas as pd

    cases = {
        1: " ".join(f"t{i}" for i in range(40)),   # 2 chunks (0, 24)
        2: " ".join(f"t{i}" for i in range(32)),   # exactly one window
        3: " ".join(f"t{i}" for i in range(33)),   # second window needed
        4: "solo",                                  # single token
    }
    sdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(cases),
                "text": list(cases.values()),
                "lang": "en",
                "source": "t",
                "n_chars": [len(v) for v in cases.values()],
            }
        )
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        sdf.write.parquet(os.path.join(d, "documents.parquet"))
        rows = REGISTRY["chunk_docs_overlap"].fn(spark, d).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert sorted(len(v) for v in per_doc.values()) == [1, 1, 2, 2]
    for doc_id, text in cases.items():
        assert sorted(
            (r["chunk_idx"], r["start_token"], r["n_chunk_tokens"], r["chunk_text"])
            for r in per_doc[doc_id]
        ) == _reference_chunks(text), doc_id
