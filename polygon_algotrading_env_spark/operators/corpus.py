"""Corpus-statistics operators — frequency models over the whole corpus
applied back to each document.

The CCNet/Gopher-style quality pipelines score documents against a
corpus- (or reference-) level language model; the engine-native analogue
is a token document-frequency model: one aggregation builds the model,
one join + aggregate scores every document against it. Both stages are
plain exploded-token shuffles — the same cost shape as the boilerplate
n-gram pass, linear in corpus token count.

Cross-engine verification note: scores are exposed as EXACT integer
pairs (sum of document frequencies, token count) rather than a float
mean-log — an unordered float sum over tokens is engine-order-dependent
at the last ulp, integers are not. Downstream ranking/filtering divides
or logs them as it pleases.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from polygon_algotrading_env_spark.functions.text import word_tokens


def token_doc_frequency(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The corpus model: for every lowercased word token, the number of
    documents containing it (per-doc distinct, so in-doc repetition does
    not inflate the count). Returns ``(token, df)``."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(F.array_distinct(word_tokens(F.col(text_col)))).alias("token"),
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def doc_rarity_scores(
    docs: DataFrame,
    model: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document against the token document-frequency model:
    ``sum_df`` (total document frequency over the doc's distinct tokens)
    and ``n_model_tokens``. Low ``sum_df / n_model_tokens`` ⇒ the document
    is made of corpus-rare vocabulary (gibberish or exotic); high ⇒
    common/boilerplate vocabulary — both tails are the usual curation
    cut candidates.

    ``model`` defaults to the corpus itself (self-scoring); pass a model
    built from a clean reference corpus for CCNet-style filtering. The
    join is token ⋈ token — a balanced hash shuffle; at 100 TB the model
    is written once to a silver table and reused by every scoring run.

    Semantics are INNER-join (the certified oracle's): only model-matched
    tokens count toward both ``sum_df`` and ``n_model_tokens``, so an
    external reference model's out-of-vocabulary tokens never inflate the
    denominator. A document whose tokens are ALL out-of-model therefore
    has no output row. In self-scoring mode the model is derived from the
    same exploded relation by hash aggregation — map-side partial
    aggregation collapses every input partition to ≤ |vocabulary| rows
    before the shuffle, so the model build is nearly free, and the
    score-back join is a hash join AQE can broadcast (vocab-sized side)
    or skew-split. This beats a ``count() over (partition by token)``
    window, which must Exchange+Sort the FULL exploded relation with no
    partial aggregation and degenerates on skewed (common) tokens — the
    window variant measured 2× slower cold at sf0.1 and the gap widens
    with corpus size. The second explode (lineage recompute of ``toks``)
    is embarrassingly parallel CPU, cheaper at any scale than persisting
    the exploded relation. For REPEATED scoring runs, materialize
    :func:`token_doc_frequency` to a silver table once and pass it as
    ``model`` (``curate_corpus`` automates this via
    ``rarity_model_path``).
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_tokens(F.col(text_col)))).alias("token"),
    )
    if model is None:
        model = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = toks.join(model, "token", "inner")
    return scored.groupBy(id_col).agg(
        F.sum("df").cast("bigint").alias("sum_df"),
        F.count(F.lit(1)).cast("bigint").alias("n_model_tokens"),
    )


def cross_split_contamination(
    docs: DataFrame,
    split_col: str = "split",
    train_label: str = "train",
    test_label: str = "test",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    max_train_df: int = 64,
) -> DataFrame:
    """Train→test contamination audit: for every test document, how many
    of its character ``n``-gram shingles also occur in the train split,
    and how many distinct train documents share at least one — the
    benchmark-leakage check every training-data pipeline runs before a
    split ships.

    Shingles whose train-side document frequency exceeds ``max_train_df``
    are ignored: ubiquitous boilerplate n-grams are not evidence of
    leakage, and — the scale reason — an uncapped equi-join on a shingle
    shared by 10⁵ train × 10⁴ test docs is a 10⁹-row hot key. With the
    cap, join fan-out per shingle is ≤ ``max_train_df`` and the whole
    audit is two shingle-key shuffles plus a per-test-doc aggregate.

    The per-shingle frequency is DELIBERATELY a
    ``count() over (partition by shingle)`` window, not a hash
    aggregation joined back. The usual rule (aggregate + join-back
    beats a window because partial aggregation collapses the exchange —
    the :func:`doc_rarity_scores` rationale) inverts here: 8-char
    shingles are nearly unique per input partition, so the "df
    relation" barely collapses and the aggregate variant pays a
    full-width exchange for the model PLUS a second full exchange (and
    a third explode) to join it back, while the window pays ONE
    exchange + sort that the test⋈train sort-merge join then reuses.
    Measured A/B on the deterministic 100× fixture (min-of-3, 96g
    heap): window 8.3 s vs aggregate+join-back 15.0 s; dead heat at
    1× (1.60 vs 1.56 s). High-collapse keys (word tokens) want the
    aggregate; shingle-cardinality keys want the window.

    Returns (test ``id_col``, n_shared_shingles, n_train_docs) — exact
    integers, hash-comparable cross-engine. Test docs with no (capped)
    overlap produce no row.
    """
    from polygon_algotrading_env_spark.functions.text import char_ngrams
    from pyspark.sql import Window

    sh = docs.filter(F.length(text_col) >= n).select(
        F.col(id_col),
        F.col(split_col),
        F.explode(F.array_distinct(char_ngrams(F.col(text_col), n))).alias(
            "shingle"
        ),
    )
    tr = (
        sh.filter(F.col(split_col) == train_label)
        .select(F.col(id_col).alias("train_doc_id"), "shingle")
        .withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
        .filter(F.col("df") <= max_train_df)
    )
    te = sh.filter(F.col(split_col) == test_label).select(
        F.col(id_col).alias("test_doc_id"), "shingle"
    )
    return (
        te.join(tr, "shingle")
        .groupBy("test_doc_id")
        .agg(
            F.count_distinct(F.col("shingle")).cast("bigint").alias(
                "n_shared_shingles"
            ),
            F.count_distinct(F.col("train_doc_id")).cast("bigint").alias(
                "n_train_docs"
            ),
        )
    )


def isotonic_calibrate(
    df: DataFrame,
    score_col: str,
    target_col: str,
    keys: Sequence[str] = (),
    out_col: str = "calibrated",
) -> DataFrame:
    """Isotonic (PAV) calibration per key group: fit the best monotone
    step function mapping raw scores to observed targets and attach the
    calibrated value — the distribution-free recalibration for quality-
    classifier scores before thresholding a corpus on them (a score of
    0.9 should MEAN 90% — isotonic forces exactly that without assuming
    a sigmoid shape the way Platt scaling does).

    Pool-Adjacent-Violators runs per group in an Arrow grouped map (the
    fit is inherently sequential in score order; parallelism = group
    count, the same sharding contract as the EMA/Kalman recursions).
    Deterministic: ties in score sort by the target then row order, and
    PAV's solution is unique regardless of pooling order. Groups with a
    single row calibrate to their own target.

    WARNING — keys=() serializes the WORLD onto one task: the keyless
    fallback is a single global PAV fit (groupBy(lit(1)) grouped map),
    acceptable only for driver-scale calibration sets (≲ millions of
    rows). At corpus scale always pass keys (per-domain / per-source
    calibration), which is also the statistically-sensible fit.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(df.schema.fields + [StructField(out_col, DoubleType())])
    key_list = list(keys)

    def _pav(pdf: pd.DataFrame) -> pd.DataFrame:
        order = pdf.sort_values([score_col, target_col]).index
        y = pdf.loc[order, target_col].to_numpy(dtype=np.float64)
        # blocks: (mean, weight) merged while decreasing
        means: list[float] = []
        weights: list[float] = []
        counts: list[int] = []
        for v in y:
            means.append(float(v)); weights.append(1.0); counts.append(1)
            while len(means) > 1 and means[-2] > means[-1]:
                m2, w2, c2 = means.pop(), weights.pop(), counts.pop()
                m1, w1, c1 = means.pop(), weights.pop(), counts.pop()
                w = w1 + w2
                means.append((m1 * w1 + m2 * w2) / w)
                weights.append(w)
                counts.append(c1 + c2)
        fitted = np.repeat(means, counts)
        out = pdf.copy()
        out.loc[order, out_col] = fitted
        return out

    if key_list:
        return df.groupBy(*key_list).applyInPandas(_pav, schema=schema)
    return df.groupBy(F.lit(1).alias("__g")).applyInPandas(
        lambda pdf: _pav(pdf.drop(columns="__g", errors="ignore")), schema=schema
    )


def dsir_log_weights(
    docs: DataFrame,
    target_cond,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR importance weights (Data Selection via Importance Resampling,
    Xie et al. 2023, arXiv:2302.03169): score every document by how much
    more likely its hashed-bigram bag is under the TARGET domain's
    unigram-over-buckets model than under the RAW corpus model —
    log w(x) = Σ_tokens [log p_target(b) − log p_raw(b)] — then keep the
    highest-weight documents to build a target-like corpus from raw data.

    ``target_cond`` is a boolean Column marking the target-domain rows
    (e.g. ``F.col("lang") == "de"`` or a curated-subset flag); the raw
    model is the whole input. Hashed features (md5 of the bigram, mod
    ``n_buckets``) mean NO vocabulary artifact ships — the same
    vocabulary-free property the hashed TF-IDF vectorizer exploits —
    and both models are add-one smoothed so unseen buckets stay finite.

    Plan shape (the 100 TB story): adjacent bigrams are paired via
    explode(sequence(2, n_tokens)) + element_at(tokens, i−1/i) over the
    token array — pure index arithmetic inside whole-stage codegen, so
    the plan's ONLY corpus-sized shuffle is the partial-aggregated
    per-doc bucket-count exchange (r15; the r14 shape paired bigrams
    with lead() over a (doc, pos) window, paying a second corpus-sized
    exchange plus a per-doc sort). A zip_with-over-shifted-slices
    variant was A/B-measured in r14 and REJECTED (2.7× slower at 100×:
    HOF lambdas evaluate interpreted per token); the sequence+element_at
    form is the same shuffle-free shape without the lambda tax
    (A/B'd in r15 — see OPTIMIZATION_r15.md). The remaining shuffle
    partitions on doc id and stays frontier-narrow. BOTH models are
    bucket-bounded aggregates
    (≤ n_buckets rows each) broadcast back onto the per-doc counts —
    the corpus text is never joined to itself and the scoring join
    fan-in is bounded by n_buckets, independent of corpus size. The
    model and scoring branches are kept byte-identical below the
    per-doc exchange (see the inline comment) so AQE stage reuse runs
    the corpus pass ONCE — previously it ran twice per query.

    Returns (id_col, n_bigrams, log_weight) — rank or threshold
    ``log_weight`` downstream (> 0 ⇒ more target-like than raw-like).
    """
    from pyspark.sql import Window

    # The tokenize+hash pass is STAGE-1 bound (parallelism = input
    # splits); the local single-file documents fixture scans as ONE
    # partition, serializing it. Rebalance ONLY when the scan is
    # under-split relative to the session's cores — the same guard the
    # MinHash signature pass proved (queries/text.py:_mh_sig_df); a
    # 100 TB scan has millions of splits and never triggers it.
    sc = docs.sparkSession.sparkContext
    if docs.rdd.getNumPartitions() < sc.defaultParallelism // 2:
        docs = docs.repartition(sc.defaultParallelism)
    # Adjacent bigrams via explode(sequence) + element_at over the token
    # ARRAY — index arithmetic, not lambdas, so the whole pipeline
    # (regex, generate, element_at, md5) stays inside whole-stage
    # codegen AND the (doc, pos) window exchange + per-doc sort the r14
    # posexplode+lead() shape paid is gone outright (r15, guide §2.4):
    # the plan's ONLY corpus-sized shuffle is now the partial-aggregated
    # per-doc bucket-count exchange. (A zip_with-over-shifted-slices
    # variant was A/B-measured in r14 and REJECTED 2.7x — its HOF
    # lambdas evaluate interpreted per token; this formulation is the
    # shuffle-free shape WITHOUT the lambda tax, A/B'd against
    # posexplode+lead in r15: see OPTIMIZATION_r15.md. The token array
    # is never copied per generated row — Generate and the element_at
    # projection fuse into one codegen stage, and the partial aggregate
    # prunes the array before anything is materialized.)
    toks_arr = docs.select(
        F.col(id_col),
        target_cond.alias("__is_target"),
        word_tokens(text_col).alias("__a"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        " ",
                        F.element_at(F.col("__a"), F.col("__i") - 1),
                        F.element_at(F.col("__a"), F.col("__i")),
                    )
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("bigint")
        % n_buckets
    )
    big = (
        toks_arr.select(
            id_col,
            "__is_target",
            "__a",
            F.explode(
                F.when(
                    F.size("__a") >= 2,
                    F.sequence(F.lit(2), F.size("__a")),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("__i"),
        )
        .select(id_col, "__is_target", bucket.alias("__b"))
    )
    # Two deliberate quirks keep the model and scoring branches
    # BYTE-IDENTICAL below the per-doc exchange so AQE's stage reuse
    # computes the corpus tokenize+hash+aggregate pass ONCE:
    # - the (vacuously true) isnotnull(__b): the scoring equi-join
    #   pushes exactly this predicate into its copy of the subtree, so
    #   the model copy must carry it too;
    # - __is_target rides as a GROUP KEY (functionally dependent on
    #   doc_id, so groups are unchanged) rather than an any_value()
    #   aggregate: the scoring branch never references it downstream,
    #   and column pruning would strip it from that branch's aggregate
    #   — a key cannot be pruned, an aggregate function can.
    # Without either, the two copies differ by one node and the corpus
    # pass ran twice (plan-asserted in tests).
    per_doc = (
        big.where(F.col("__b").isNotNull())
        .groupBy(id_col, "__is_target", "__b")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    # BOTH models in one aggregate (conditional sum), totals via a window
    # over the model itself — the model is <= n_buckets rows, so the
    # single-partition window is trivial. The model branch re-aggregates
    # the SAME per_doc subplan the scoring branch consumes; because the
    # two copies canonicalize identically (see the per_doc comment), AQE
    # stage reuse materializes the corpus pass once and replays its
    # shuffle output here — no persist() needed (plan-asserted in
    # tests/test_plans.py).
    w_all = Window.partitionBy()
    model = (
        per_doc.groupBy("__b")
        .agg(
            F.sum("__n").alias("__nr"),
            F.sum(F.when(F.col("__is_target"), F.col("__n")).otherwise(0)).alias(
                "__nt"
            ),
        )
        .withColumn("__tot_r", F.sum("__nr").over(w_all))
        .withColumn("__tot_t", F.sum("__nt").over(w_all))
    )
    b = float(n_buckets)
    log_ratio = F.log(
        (F.col("__nt") + 1.0) / (F.col("__tot_t") + b)
    ) - F.log((F.col("__nr") + 1.0) / (F.col("__tot_r") + b))
    return (
        per_doc.join(F.broadcast(model), "__b")
        .groupBy(id_col)
        .agg(
            F.sum("__n").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("__n") * log_ratio).alias("log_weight"),
        )
    )


def _apply_merge(syms, a: str, b: str):
    """Left-to-right non-overlapping merge of adjacent (a, b) into a+b
    inside a symbol array — the standard BPE merge step as a JVM
    ``aggregate`` fold (a freshly-merged symbol never immediately
    re-merges with the next input symbol)."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(a + b)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 32,
    end_of_word: str = "</w>",
):
    """Distributed BPE tokenizer training (Sennrich et al. 2016) — the
    merge-table learning step of the tokenizer every LLM pipeline ships.

    The classic formulation is what makes this scale: the corpus is
    scanned ONCE into the word-frequency table (vocab-sized — Zipf says
    a 100 TB corpus still has a few-million-row word vocab), and every
    merge round operates on that tiny table: adjacent-symbol pair counts
    weighted by word frequency (hash aggregate), the most frequent pair
    (deterministic tie-break: count desc, then pair lexicographically —
    a bounded 1-row collect per round, metadata not data), and an
    in-place merge of that pair in every word's symbol array via a JVM
    ``aggregate`` fold (left-to-right non-overlapping, the standard BPE
    merge order; no Python in the loop). ``localCheckpoint`` truncates
    the per-round lineage exactly as the graph iterations do.

    Returns ``(merges, vocab)``: the learned merge table
    (rank, left, right, merged, pair_freq) and the final per-word symbol
    segmentation (word, freq, symbols). Both deterministic — merge
    ranks are reproducible across runs, partitionings, and engines.
    """
    words = (
        docs.select(F.explode(word_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    vocab = words.select(
        "w",
        "freq",
        F.concat(
            F.split("w", ""), F.array(F.lit(end_of_word))
        ).alias("symbols"),
    ).localCheckpoint()

    spark = docs.sparkSession
    merges: list[tuple] = []
    for rank in range(n_merges):
        syms = F.col("symbols")
        # adjacent pairs via zipped slices (NOT sequence(1, size-1):
        # Spark's sequence DESCENDS when start > stop, so a fully-merged
        # single-symbol word would index out of bounds); slice with
        # length 0 is just empty, so 1-symbol words contribute no pairs.
        pairs = vocab.select(
            "freq",
            F.explode(
                F.arrays_zip(
                    F.slice(syms, 1, F.size(syms) - 1).alias("a"),
                    F.slice(syms, 2, F.size(syms) - 1).alias("b"),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((rank, a, b, a + b, cnt))
        vocab = vocab.select(
            "w", "freq", _apply_merge(syms, a, b).alias("symbols")
        ).localCheckpoint()

    merges_df = spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_freq bigint"
    )
    return merges_df, vocab


def bpe_segment(
    words: DataFrame,
    merges,
    word_col: str = "w",
    end_of_word: str = "</w>",
    out_col: str = "symbols",
) -> DataFrame:
    """Tokenize words with a LEARNED BPE merge table — the apply step that
    pairs with :func:`bpe_train` (train once, segment any corpus).

    ``merges`` is the trainer's merge DataFrame (or a (rank, left,
    right, ...) row list); like any shipped tokenizer artifact it is
    vocab-bounded metadata, so collecting it driver-side and folding the
    merges into the plan as literals is the scale-correct move — the
    segmentation itself is pure JVM array algebra applied per DISTINCT
    word (segment the word vocab, then join back to token streams; never
    re-segment every occurrence). Merges apply in rank order, each as the
    same left-to-right fold the trainer used, with periodic
    localCheckpoint so M chained folds never build an M-deep codegen
    expression.
    """
    if isinstance(merges, DataFrame):
        merges = merges.orderBy("rank").collect()
    out = words.withColumn(
        out_col,
        F.concat(F.split(F.col(word_col), ""), F.array(F.lit(end_of_word))),
    )
    for i, m in enumerate(merges):
        out = out.withColumn(
            out_col, _apply_merge(F.col(out_col), m["left"], m["right"])
        )
        if (i + 1) % 8 == 0:
            out = out.localCheckpoint()
    return out


# --- unigram-LM tokenizer (Kudo 2018, hard-EM subset) ----------------------

def _viterbi_pieces(word: str, logp: dict, max_len: int):
    """Best unigram segmentation of ``word`` under piece log-probs, or
    None when no path exists. Deterministic tie-break: at equal path
    score the LONGER final piece wins (lengths scanned ascending with a
    >= update), so results are stable across runs and partitionings."""
    n = len(word)
    neg = float("-inf")
    score = [neg] * (n + 1)
    back = [0] * (n + 1)
    score[0] = 0.0
    for i in range(1, n + 1):
        for ln in range(1, min(max_len, i) + 1):
            lp = logp.get(word[i - ln : i])
            if lp is None:
                continue
            cand = score[i - ln] + lp
            if cand >= score[i]:
                score[i] = cand
                back[i] = ln
    if score[n] == neg:
        return None
    out = []
    i = n
    while i > 0:
        out.append(word[i - back[i] : i])
        i -= back[i]
    out.reverse()
    return out


def _unigram_segment_udf(logp: dict, max_len: int):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _seg(words: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _viterbi_pieces(w, logp, max_len) if w is not None else None
                for w in words
            ]
        )

    return _seg


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    seed_max_len: int = 6,
    seed_size: int = 512,
    n_iter: int = 4,
    vocab_size: int = 128,
):
    """Distributed unigram-LM tokenizer training (Kudo 2018's model, the
    hard-EM/Viterbi variant) — the OTHER tokenizer family next to BPE:
    instead of growing merges bottom-up, start from a large substring
    seed vocabulary and iteratively re-estimate piece probabilities from
    the corpus' best segmentations, then keep the ``vocab_size`` most
    probable pieces (single characters are never pruned — the fallback
    that makes every string segmentable).

    Scale shape — the same discipline as :func:`bpe_train`: ONE corpus
    scan builds the word-frequency table (vocab-sized under Zipf at any
    corpus size); seeding explodes substrings of the DISTINCT words
    (bounded by vocab × seed_max_len); each EM round segments only the
    distinct words (Arrow UDF with the piece table broadcast as a plain
    dict — tokenizer artifacts are KB-sized metadata) and re-estimates
    probabilities from a vocab-shaped aggregate. Driver materialization
    is bounded by ``seed_size`` rows per round, never corpus-shaped.
    Deterministic: seed selection orders (count desc, piece asc), the
    Viterbi tie-break is fixed, and probabilities derive from exact
    integer counts — reproducible across runs and partitionings (pinned
    by tests against a straight-Python reference).

    Returns ``(pieces, words)``: the final piece table
    (piece, logprob double) sorted by prob desc then piece, and the
    word-frequency table with each word's final segmentation.
    """
    import math

    words = (
        docs.select(F.explode(word_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint()
    )

    # Seed: every substring of length 1..seed_max_len of every distinct
    # word, weighted by word frequency; top seed_size by weighted count
    # (chars always kept). JVM-side nested transform + flatten.
    subs = words.select(
        "freq",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("w")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(seed_max_len), F.length("w") - i + 1
                            ),
                        ),
                        lambda ln: F.col("w").substr(i, ln),
                    ),
                )
            )
        ).alias("piece"),
    )
    counts = subs.groupBy("piece").agg(
        F.sum("freq").cast("bigint").alias("cnt")
    )
    chars = {
        r["piece"]: r["cnt"]
        for r in counts.where(F.length("piece") == 1).collect()
    }
    top = {
        r["piece"]: r["cnt"]
        for r in counts.orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(seed_size)
        .collect()
    }
    top.update(chars)

    def normalize(cnts: dict) -> dict:
        total = sum(cnts.values())
        return {p: math.log(c / total) for p, c in cnts.items() if c > 0}

    logp = normalize(top)
    for _ in range(n_iter):
        seg = _unigram_segment_udf(logp, seed_max_len)
        piece_counts = (
            words.select("freq", F.explode(seg(F.col("w"))).alias("piece"))
            .groupBy("piece")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
            .collect()
        )
        cnts = {r["piece"]: r["cnt"] for r in piece_counts}
        for ch, c in chars.items():  # fallback floor: chars never vanish
            cnts.setdefault(ch, 1)
        logp = normalize(cnts)

    # Final prune to vocab_size by probability (desc, piece asc), chars
    # always kept, then renormalize.
    ranked = sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = {p for p, _ in ranked[:vocab_size]} | set(chars)
    final_counts = {p: math.exp(lp) for p, lp in logp.items() if p in kept}
    logp = {
        p: math.log(x / sum(final_counts.values()))
        for p, x in final_counts.items()
    }

    spark = docs.sparkSession
    pieces = spark.createDataFrame(
        sorted(logp.items(), key=lambda kv: (-kv[1], kv[0])),
        "piece string, logprob double",
    )
    seg = _unigram_segment_udf(logp, seed_max_len)
    return pieces, words.select(
        "w", "freq", seg(F.col("w")).alias("pieces")
    )


def unigram_segment(
    words: DataFrame,
    pieces,
    word_col: str = "w",
    out_col: str = "pieces",
) -> DataFrame:
    """Segment words with a LEARNED unigram piece table (train once,
    segment any corpus) — the apply step pairing with
    :func:`unigram_train`. ``pieces`` is the trainer's (piece, logprob)
    DataFrame or a row list; vocab-bounded metadata, broadcast into the
    Arrow segmentation kernel. Unseen characters make a word
    unsegmentable → NULL (fail loudly, never silently drop bytes)."""
    if isinstance(pieces, DataFrame):
        pieces = pieces.collect()
    logp = {r["piece"]: r["logprob"] for r in pieces}
    max_len = max((len(p) for p in logp), default=1)
    seg = _unigram_segment_udf(logp, max_len)
    return words.withColumn(out_col, seg(F.col(word_col)))
