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


# --- isotonic calibration -------------------------------------------------

def _pav_ref(pairs):
    """Reference PAV over (score, target) pairs sorted by (score, target)."""
    ys = [t for _, t in sorted(pairs)]
    blocks = [[y, 1.0] for y in ys]
    out = []
    stack = []
    for y in ys:
        stack.append([y, 1.0])
        while len(stack) > 1 and stack[-2][0] > stack[-1][0]:
            m2, w2 = stack.pop()
            m1, w1 = stack.pop()
            stack.append([(m1 * w1 + m2 * w2) / (w1 + w2), w1 + w2])
    for m, w in stack:
        out.extend([m] * int(w))
    return out


def test_isotonic_calibration_matches_reference_and_is_monotone(spark):
    from polygon_algotrading_env_spark.operators.corpus import (
        isotonic_calibrate,
    )

    pairs = [
        (0.1, 0.0), (0.2, 1.0), (0.3, 0.0), (0.4, 0.0), (0.5, 1.0),
        (0.6, 0.0), (0.7, 1.0), (0.8, 1.0), (0.9, 0.0), (0.95, 1.0),
    ]
    rows = [("g", s, t) for s, t in pairs]
    df = spark.createDataFrame(rows, "grp string, score double, y double")
    out = (
        isotonic_calibrate(df, "score", "y", keys=("grp",))
        .orderBy("score")
        .collect()
    )
    got = [r["calibrated"] for r in out]
    ref = _pav_ref(pairs)
    assert all(abs(a - b) < 1e-12 for a, b in zip(got, ref))
    # monotone non-decreasing in score
    assert all(got[i] <= got[i + 1] + 1e-12 for i in range(len(got) - 1))
    # block means preserve the global mean (PAV invariant)
    assert abs(sum(got) / len(got) - sum(t for _, t in pairs) / len(pairs)) < 1e-12


def test_isotonic_calibration_groups_independent(spark):
    from polygon_algotrading_env_spark.operators.corpus import (
        isotonic_calibrate,
    )

    rows = [("a", 0.1, 1.0), ("a", 0.9, 0.0), ("b", 0.1, 0.0), ("b", 0.9, 1.0)]
    df = spark.createDataFrame(rows, "grp string, score double, y double")
    got = {
        (r["grp"], r["score"]): r["calibrated"]
        for r in isotonic_calibrate(df, "score", "y", keys=("grp",)).collect()
    }
    # group a violates monotonicity → pooled to 0.5; group b is already
    # isotone → passes through untouched
    assert got[("a", 0.1)] == got[("a", 0.9)] == 0.5
    assert got[("b", 0.1)] == 0.0 and got[("b", 0.9)] == 1.0


def test_dsir_log_weights_ranks_target_like_docs(spark):
    """DSIR sanity on a controlled corpus: documents sharing the target
    domain's vocabulary must out-weigh documents made of off-domain
    vocabulary, target docs themselves score highest, and the weight is
    deterministic across runs (hashed features, no RNG)."""
    import pyspark.sql.functions as F

    from polygon_algotrading_env_spark.operators.corpus import dsir_log_weights

    tgt_text = "quantum flux lattice spin boson fermion gauge field theory"
    rows = (
        [(i, "de", tgt_text) for i in range(5)]                    # target
        + [(10 + i, "en", "quantum flux lattice spin entangled") for i in range(3)]
        + [(20 + i, "en", "recipe butter flour sugar oven bake") for i in range(3)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(
            docs, F.col("lang") == "de", n_buckets=256
        ).collect()
    }
    assert set(out) == {0, 1, 2, 3, 4, 10, 11, 12, 20, 21, 22}
    # physics-adjacent docs beat cooking docs; target docs beat both
    assert min(out[i] for i in (10, 11, 12)) > max(out[i] for i in (20, 21, 22))
    assert min(out[i] for i in range(5)) > max(out[i] for i in (10, 11, 12))
    again = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(
            docs, F.col("lang") == "de", n_buckets=256
        ).collect()
    }
    assert again == out


def _bpe_reference(word_freqs, n_merges, eow="</w>"):
    """Textbook BPE trainer (Sennrich et al. fig. 1) as the oracle."""
    vocab = {tuple(list(w) + [eow]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, a + b, cnt))
        out = {}
        for syms, f in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            out[tuple(merged)] = out.get(tuple(merged), 0) + f
        vocab = out
    return merges, vocab


def test_bpe_train_matches_textbook_reference(spark):
    """The distributed trainer must learn the SAME merge table, in the
    same order, as the sequential textbook algorithm — including the
    left-to-right non-overlapping merge semantics ('aaaa' + merge (a,a)
    → [aa, aa]) and the (count desc, pair lexicographic) tie-break."""
    from polygon_algotrading_env_spark.operators.corpus import bpe_train

    corpus = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        + ["aaaa"] * 2
    )
    docs = spark.createDataFrame([(" ".join(corpus),)], "text string")
    merges_df, vocab_df = bpe_train(docs, n_merges=8)
    got = [
        (r["left"], r["right"], r["merged"], r["pair_freq"])
        for r in merges_df.orderBy("rank").collect()
    ]
    freqs = {w: corpus.count(w) for w in set(corpus)}
    want_merges, want_vocab = _bpe_reference(freqs, 8)
    assert got == want_merges
    got_vocab = {
        tuple(r["symbols"]): r["freq"] for r in vocab_df.collect()
    }
    assert got_vocab == want_vocab


def test_bpe_train_deterministic_across_partitionings(spark):
    from polygon_algotrading_env_spark.operators.corpus import bpe_train

    rows = [(f"spark {w} engine data",) for w in ("alpha", "beta", "gamma")] * 4
    one = spark.createDataFrame(rows, "text string").coalesce(1)
    many = spark.createDataFrame(rows, "text string").repartition(7)
    m1 = [tuple(r) for r in bpe_train(one, n_merges=5)[0].orderBy("rank").collect()]
    m2 = [tuple(r) for r in bpe_train(many, n_merges=5)[0].orderBy("rank").collect()]
    assert m1 == m2 and len(m1) == 5


def test_bpe_train_stops_when_fully_merged(spark):
    """A corpus whose words collapse to single symbols must stop early
    (no pairs left) rather than index past the array — the
    sequence-descends-when-start>stop edge."""
    from polygon_algotrading_env_spark.operators.corpus import bpe_train

    docs = spark.createDataFrame([("a a a ab",)], "text string")
    merges, vocab = bpe_train(docs, n_merges=10)
    got = [tuple(r) for r in merges.orderBy("rank").collect()]
    # (a,</w>) x3 wins round 0; then ab: (a,b) then (ab,</w>); then done
    assert len(got) == 3 < 10
    assert all(len(r["symbols"]) == 1 for r in vocab.collect())


def test_bpe_segment_reproduces_training_segmentation_and_handles_unseen(spark):
    """Applying the learned merge table must reproduce the trainer's own
    final segmentation on training words, and segment UNSEEN words
    exactly as the sequential apply would."""
    from polygon_algotrading_env_spark.operators.corpus import (
        bpe_segment,
        bpe_train,
    )

    corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = spark.createDataFrame([(" ".join(corpus),)], "text string")
    merges, vocab = bpe_train(docs, n_merges=10)

    train_words = spark.createDataFrame(
        [(w,) for w in sorted(set(corpus))], "w string"
    )
    seg = {
        r["w"]: tuple(r["symbols"])
        for r in bpe_segment(train_words, merges).collect()
    }
    from_train = {r["w"]: tuple(r["symbols"]) for r in vocab.collect()}
    assert seg == from_train

    # unseen word: apply the same merges sequentially in python
    mlist = [(r["left"], r["right"]) for r in merges.orderBy("rank").collect()]
    word = "lowest"
    ref = list(word) + ["</w>"]
    for a, b in mlist:
        out, i = [], 0
        while i < len(ref):
            if i + 1 < len(ref) and ref[i] == a and ref[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(ref[i])
                i += 1
        ref = out
    unseen = spark.createDataFrame([(word,)], "w string")
    got = tuple(bpe_segment(unseen, merges).collect()[0]["symbols"])
    assert got == tuple(ref)


def test_bpe_segment_matches_trainer_segmentation(spark):
    """bpe_segment (the apply step) must reproduce the trainer's own
    final vocabulary segmentation when given the trainer's merge table —
    train/apply consistency is the tokenizer contract (a shipped merge
    table must segment identically everywhere)."""
    from polygon_algotrading_env_spark.operators.corpus import (
        bpe_segment,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [("low lower lowest newer newest wide widest low low newer",)],
        "text string",
    )
    merges, vocab = bpe_train(docs, n_merges=10)
    words = vocab.select("w")
    seg = bpe_segment(words, merges)
    got = {r["w"]: list(r["symbols"]) for r in seg.collect()}
    want = {r["w"]: list(r["symbols"]) for r in vocab.collect()}
    assert got == want
    # and a list-of-rows merge table works the same as the DataFrame
    seg2 = bpe_segment(words, merges.orderBy("rank").collect())
    assert {r["w"]: list(r["symbols"]) for r in seg2.collect()} == want


# --- unigram-LM tokenizer (Kudo 2018, hard-EM subset) ----------------------

def _unigram_reference(word_freqs, seed_max_len, seed_size, n_iter, vocab_size):
    """Straight-Python replica of unigram_train's algorithm for the
    merge-for-merge style equivalence check."""
    import math

    from polygon_algotrading_env_spark.operators.corpus import _viterbi_pieces

    counts = {}
    for w, f in word_freqs.items():
        for i in range(len(w)):
            for ln in range(1, min(seed_max_len, len(w) - i) + 1):
                p = w[i : i + ln]
                counts[p] = counts.get(p, 0) + f
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    top = dict(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    )
    top.update(chars)

    def norm(c):
        t = sum(c.values())
        return {p: math.log(v / t) for p, v in c.items() if v > 0}

    logp = norm(top)
    for _ in range(n_iter):
        cnts = {}
        for w, f in word_freqs.items():
            for p in _viterbi_pieces(w, logp, seed_max_len):
                cnts[p] = cnts.get(p, 0) + f
        for ch, _c in chars.items():
            cnts.setdefault(ch, 1)
        logp = norm(cnts)
    ranked = sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = {p for p, _ in ranked[:vocab_size]} | set(chars)
    fc = {p: math.exp(lp) for p, lp in logp.items() if p in kept}
    return {p: math.log(x / sum(fc.values())) for p, x in fc.items()}


def test_unigram_train_matches_python_reference_and_is_partition_invariant(
    spark,
):
    from polygon_algotrading_env_spark.operators.corpus import unigram_train

    rows = [(i, "ababab cdcd ababab xyz") for i in range(20)] + [
        (100, "ababab ababab"),
        (101, "cdcd xyz xyz"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pieces, words = unigram_train(
        docs, n_iter=3, seed_size=64, vocab_size=16
    )
    got = {r["piece"]: r["logprob"] for r in pieces.collect()}

    wf = {}
    for _i, text in rows:
        for w in text.split():
            wf[w] = wf.get(w, 0) + 1
    exp = _unigram_reference(wf, 6, 64, 3, 16)
    assert set(got) == set(exp)
    for p in exp:
        assert abs(got[p] - exp[p]) < 1e-12, p

    # partition invariance: the model must not depend on data layout
    pieces2, _ = unigram_train(
        docs.repartition(7), n_iter=3, seed_size=64, vocab_size=16
    )
    got2 = {r["piece"]: r["logprob"] for r in pieces2.collect()}
    assert got2 == got

    # the dominant word is learned as ONE piece and wins the vocabulary
    top = max(got, key=got.get)
    assert top == "ababab"
    segs = {r["w"]: list(r["pieces"]) for r in words.collect()}
    assert segs["ababab"] == ["ababab"]


def test_unigram_segment_fallback_and_unseen(spark):
    from polygon_algotrading_env_spark.operators.corpus import (
        unigram_segment,
        unigram_train,
    )

    docs = spark.createDataFrame(
        [(1, "hello hello world")], "doc_id long, text string"
    )
    pieces, _ = unigram_train(docs, n_iter=2, seed_size=64, vocab_size=8)
    new = spark.createDataFrame(
        [("hello",), ("holle",), ("zzz",)], "w string"
    )
    out = {r["w"]: r["pieces"] for r in unigram_segment(new, pieces).collect()}
    assert out["hello"] == ["hello"] or out["hello"] is not None
    # characters all seen -> segmentable even for an unseen word
    assert out["holle"] is not None and "".join(out["holle"]) == "holle"
    # unseen character -> NULL, never silent byte drops
    assert out["zzz"] is None


def test_viterbi_tie_break_prefers_longer_piece():
    import math

    from polygon_algotrading_env_spark.operators.corpus import _viterbi_pieces

    # p(ab) == p(a)+p(b) exactly -> tie; the longer piece must win
    logp = {"a": math.log(0.25), "b": math.log(0.25), "ab": math.log(0.0625)}
    assert _viterbi_pieces("ab", logp, 2) == ["ab"]
    assert _viterbi_pieces("aab", logp, 2) == ["a", "ab"]
