"""Mergeable distinct-count sketches (Apache DataSketches HLL, built into
Spark SQL as ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``).

The 100 TB pattern this enables: distinct counts are the one aggregate
that does NOT decompose over partitions (|A ∪ B| ≠ |A| + |B|), so exact
global distincts force a full shuffle of the key domain. Sketches fix the
economics: build a ~KB-sized sketch per partition/segment/day ONCE (full
precision parallelism, map-side), persist them in a silver table, and
answer any union-of-segments distinct question later by merging sketches —
no rescan, no key shuffle, error ~1.6%/sqrt(2^lgk).

Estimates are deterministic: the sketch is a pure, order-independent
function of the input SET (hash-based, no RNG), so repeated runs and
different partitionings yield byte-identical sketches — asserted in
tests. (DuckDB's approx_count_distinct is a different HLL implementation
with different estimates, hence no cross-engine oracle; accuracy is
pinned against exact counts in pytest instead.)
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: log2 of the sketch's bucket count; 12 → 4096 buckets, ~1.6% rel. error.
DEFAULT_LGK = 12


def hll_group_sketches(
    df: DataFrame,
    col: str,
    by: Sequence[str],
    lgk: int = DEFAULT_LGK,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """One mergeable HLL sketch of ``col``'s distinct values per group —
    the build side of the sketch-per-segment pattern (write these to a
    silver table at scale)."""
    return df.groupBy(*by).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias(sketch_col)
    )


def hll_estimate(df: DataFrame, sketch_col: str = "hll_sketch") -> DataFrame:
    """Attach each group's distinct-count estimate."""
    return df.withColumn(
        "distinct_est", F.hll_sketch_estimate(F.col(sketch_col))
    )


def hll_union_estimate(
    df: DataFrame, sketch_col: str = "hll_sketch"
) -> DataFrame:
    """Merge all groups' sketches into one and estimate the UNION's
    distinct count — the query-time side: any segment combination folds
    in sketch space without touching the base data. (The boolean arg
    permits merging sketches built with different lgConfigK.)"""
    return df.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(True))
        ).alias("distinct_est")
    )


# ---------------------------------------------------------------------------
# Frequent items: Misra-Gries candidates + exact recount (certified top-k)
# ---------------------------------------------------------------------------

def mg_partition_candidates(
    df: DataFrame, key_col: str, capacity: int, with_totals: bool = False
) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``key_col`` — the candidate-
    generation half of the certified heavy-hitter pattern.

    Each partition keeps at most ``capacity`` keys; per Arrow batch the
    batch's value counts fold into the summary (a vectorized pandas
    index-aligned add, not a per-key Python loop), then the summary is
    trimmed back to capacity by subtracting the minimum surviving weight
    (the mergeable-summaries formulation of MG's decrement step, which
    preserves the bound: a key whose true count within the partition
    exceeds n_partition/(capacity+1) is guaranteed to survive). Summing
    across partitions, every key with GLOBAL count > N/(capacity+1)
    appears in at least one partition's output — the completeness fact
    the exact recount relies on. Output is (key, mg_count) with mg_count
    an undercount; consumers use only the key set.

    ``with_totals=True`` additionally emits ONE NULL-key marker row per
    partition carrying the partition's exact row count, so a consumer
    that also needs N (the certificate denominator) reads it off the
    summary relation instead of paying a second full scan of the fact.
    """
    import numpy as np
    import pandas as pd

    field = df.schema[key_col]

    def _mg(batches):
        acc = None
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            vc = pdf[key_col].value_counts(dropna=True)
            acc = (
                vc.astype("int64")
                if acc is None
                else acc.add(vc, fill_value=0).astype("int64")
            )
            if len(acc) > capacity:
                # Trim: subtract the weight that empties the overflow —
                # the (cap+1)-th largest value — in one pass.
                vals = acc.to_numpy()
                cut = int(np.partition(vals, -capacity - 1)[-capacity - 1])
                acc = acc[acc > cut] - cut
        keys_out = [] if acc is None else acc.index.tolist()
        cnts_out = [] if acc is None else acc.to_numpy().tolist()
        if with_totals:
            keys_out = keys_out + [None]
            cnts_out = cnts_out + [n_part]
        yield pd.DataFrame({key_col: keys_out, "mg_count": cnts_out})

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [StructField(key_col, field.dataType), StructField("mg_count", LongType())]
    )
    return df.select(key_col).mapInPandas(_mg, schema=out_schema)


def mg_heavy_hitters(
    df: DataFrame, key_col: str, k: int, capacity: int = 4096
) -> DataFrame:
    """EXACT top-k keys by frequency without shuffling the full key domain,
    with an in-plan certificate.

    The naive plan groupBys every key — at 100 TB that shuffles the whole
    domain (billions of URLs / tokens / user ids) to count items of which
    only k matter. This plan: (1) per-partition MG summaries (map-side
    only, ≤ capacity keys each) → a candidate set of ≤ capacity·P keys;
    (2) exact recount restricted to candidates via a broadcast semi-join
    (the fact scan's second pass never shuffles — the groupBy domain is
    the candidate set); (3) deterministic top-k with key tiebreak.

    Certificate: MG completeness guarantees every key with true count
    > N/(capacity+1) is a candidate. If the k-th exact count clears that
    threshold — checked as ``kth_count * (capacity + 1) > N`` in exact
    integer arithmetic — then no non-candidate can displace any returned
    row and the answer equals the full-shuffle top-k. ``certified`` is
    emitted per row; on near-uniform data where the bound cannot hold,
    callers see ``false`` instead of a silently-approximate answer (raise
    capacity toward N/kth_count to certify; capacity ≥ |domain| always
    certifies and still never shuffles more than the domain itself).
    Completeness is part of the flag: if the candidate set yields FEWER
    than k rows (e.g. perfectly uniform data, where every trim subtracts
    the common count and summaries come back empty), the returned prefix
    may be exact but it is not the full top-k, so every row carries
    ``certified = false`` — a short result can never be misread as a
    complete certificate.
    """
    from pyspark.sql import Window

    # One Python pass produces BOTH the candidate set and the certificate
    # denominator N (NULL-key marker rows carry per-partition row counts)
    # — folding away what used to be a third full scan of the fact. The
    # summary relation is ≤ (capacity+1)·partitions rows; pin it so the
    # candidate branch and the N branch hang off ONE materialization
    # instead of each re-running the full MG pass.
    summaries = mg_partition_candidates(
        df, key_col, capacity, with_totals=True
    ).localCheckpoint(eager=False)
    cands = (
        summaries.where(F.col(key_col).isNotNull())
        .select(key_col)
        .distinct()
    )
    exact = (
        df.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    topk = exact.orderBy(F.desc("cnt"), key_col).limit(k)
    n_total = summaries.where(F.col(key_col).isNull()).agg(
        F.coalesce(F.sum("mg_count"), F.lit(0)).alias("n_total")
    )
    # kth count via a window over the k-row top-k result (k rows — the
    # single partition is trivial), NOT a second aggregate of the top-k
    # subtree: a crossJoin(agg(topk)) would re-execute the candidate
    # recount a second time.
    w_all = Window.partitionBy()
    kth = F.min("cnt").over(w_all)
    n_rows = F.count(F.lit(1)).over(w_all)
    return (
        topk.crossJoin(F.broadcast(n_total))
        .withColumn(
            "certified",
            (kth * F.lit(capacity + 1) > F.col("n_total"))
            & (n_rows == F.lit(k)),
        )
        .drop("n_total")
    )


# --- deterministic bottom-k priority samples (mergeable quantile sketch) --

def bottomk_sketch(
    df: DataFrame,
    value_col: str,
    id_col: str,
    keys=(),
    k: int = 256,
) -> DataFrame:
    """Per-key mergeable sample sketch: the ``k`` rows with the smallest
    md5 priority (keyed on ``id_col``, so the 'random' sample is
    deterministic across runs, partitionings, and engines). Bottom-k by
    a fixed priority is a uniform sample that merges EXACTLY —
    sketch(A ∪ B) = merge(sketch(A), sketch(B)) with no error term —
    which is what makes per-segment sketch tables answer union queries
    without rescanning (same role as the HLL tables, but for quantiles/
    distributions instead of distinct counts).

    Scale shape (the mg_partition_candidates pattern): stage 1 reduces
    every (key, input-partition) group to ≤ k rows map-side-local, so
    stage 2's shuffle carries at most partitions×k rows per key — the
    fact relation is never sorted per key and never collected whole into
    an aggregation buffer beyond one input partition's worth.

    Returns (keys..., sketch array<struct<pr,id,v>> sorted by priority,
    n_rows exact count).
    """
    keys = list(keys)
    pr = F.md5(F.col(id_col).cast("string"))
    item = F.struct(
        pr.alias("pr"),
        F.col(id_col).cast("string").alias("id"),
        F.col(value_col).cast("double").alias("v"),
    )
    part = df.groupBy(*keys, F.spark_partition_id().alias("__pid")).agg(
        F.slice(F.array_sort(F.collect_list(item)), 1, k).alias("__sk"),
        F.count(F.lit(1)).alias("__n"),
    )
    return part.groupBy(*keys).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("__sk"))), 1, k
        ).alias("sketch"),
        F.sum("__n").cast("bigint").alias("n_rows"),
    )


def merge_bottomk(sketch_a, sketch_b, k: int):
    """Column expression merging two bottom-k sketch arrays exactly."""
    return F.slice(F.array_sort(F.concat(sketch_a, sketch_b)), 1, k)


def bottomk_quantile(sketch, q: float):
    """Column expression: the ``q``-quantile estimate from a sketch —
    the sample value at floor(q·(m−1)) in value order (deterministic:
    duplicates of v are equal, so index choice among ties is moot)."""
    vals = F.array_sort(F.transform(sketch, lambda x: x["v"]))
    idx = F.floor(F.lit(q) * (F.size(vals) - 1)).cast("int") + 1
    return F.element_at(vals, idx)


# --- KMV (k-minimum-values) distinct sketches: set algebra HLL can't do --

def kmv_distinct_sketch(
    df: DataFrame,
    value_col: str,
    keys=(),
    k: int = 256,
) -> DataFrame:
    """Per-key KMV sketch of ``value_col``'s DISTINCT values: the k
    smallest md5 priorities of the value domain. Where HLL answers only
    union cardinalities, KMV supports set ALGEBRA — Jaccard and
    intersection estimates between segments (audience overlap, shared-
    vocabulary, common-user questions) — because the k smallest hashes
    of a union are computable from the sketches alone and membership of
    a hash in each side's sketch is exact. Deterministic (md5, no RNG):
    identical across runs, partitionings, and engines.

    Build shape: distinct-collapse per key (hash aggregate with map-side
    combine), then the same two-phase bottom-k as :func:`bottomk_sketch`.
    Returns (keys..., kmv array<string> ascending, n_exact bigint — the
    exact per-key distinct count, essentially free here since the
    distinct aggregate ran anyway; estimators that only have the sketch
    use :func:`kmv_estimate_distinct`).
    """
    keys = list(keys)
    vals = df.select(
        *keys, F.col(value_col).cast("string").alias("__v")
    ).distinct()
    pr = F.md5("__v")
    part = vals.groupBy(*keys, F.spark_partition_id().alias("__pid")).agg(
        F.slice(F.array_sort(F.collect_list(pr)), 1, k).alias("__sk"),
        F.count(F.lit(1)).alias("__n"),
    )
    return part.groupBy(*keys).agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("__sk"))), 1, k).alias(
            "kmv"
        ),
        F.sum("__n").cast("bigint").alias("n_exact"),
    )


def kmv_estimate_distinct(kmv, k: int):
    """Column expression: distinct-count estimate (k−1)/U(kth) from the
    k-th smallest priority mapped to (0,1] via its first 12 hex digits;
    short sketches (fewer than k distinct values) are exact — the sketch
    IS the value set."""
    kth_u = (
        F.conv(F.substring(F.element_at(kmv, k), 1, 12), 16, 10).cast(
            "double"
        )
        / F.lit(float(16**12))
    )
    return F.when(F.size(kmv) < k, F.size(kmv).cast("double")).otherwise(
        (F.lit(k) - 1.0) / kth_u
    )


def kmv_overlap(kmv_a, kmv_b, k: int):
    """Column expressions (overlap_in_k, union_k_size): take the k
    smallest priorities of the UNION (computable from the two sketches
    alone) and count how many belong to BOTH sides — the numerator and
    denominator of the Jaccard estimate J ≈ overlap/|union_k|. Exact
    integers: the estimate is cross-engine hashable.
    |A∩B| ≈ J · |A∪B| follows with any union-cardinality estimate."""
    union_k = F.slice(
        F.array_sort(F.array_distinct(F.concat(kmv_a, kmv_b))), 1, k
    )
    overlap = F.size(
        F.array_intersect(F.array_intersect(union_k, kmv_a), kmv_b)
    )
    return overlap, F.size(union_k)


# ---------------------------------------------------------------------------
# Canonical q-digest: the deterministic mergeable quantile sketch
# ---------------------------------------------------------------------------

#: Compression constant: sketch holds O(k·domain_bits) nodes, rank error
#: is bounded by n·domain_bits/k. 256 with 24 domain bits → ≤ 9.4% worst
#: case (observed ~1% on real distributions), ~6k-node ceiling.
QDIGEST_K = 256
QDIGEST_BITS = 24


def qdigest_build(
    df: DataFrame,
    value_col: str,
    k: int = QDIGEST_K,
    domain_bits: int = QDIGEST_BITS,
) -> tuple[DataFrame, int]:
    """Canonical q-digest (Shrivastava et al. 2004, SenSys — "Medians
    and beyond") over a NON-NEGATIVE INTEGER value column (cents grid):
    the deterministic, mergeable quantile sketch distributed systems use
    where t-digest/KLL would inject RNG or order-dependence.

    The value domain [0, 2^domain_bits) is a conceptual complete binary
    tree; a node at level l with index i covers [i·2^l, (i+1)·2^l).
    Counts start at the observed leaves and the LEVEL-SYNCHRONOUS
    canonical compression runs bottom-up: at round l, each parent sums
    its surviving level-l children (plus its own count, when merging
    pre-compressed digests); families at or under the n//k threshold
    absorb into the parent and stay active, heavier families freeze
    their children into the sketch. Classic q-digest leaves the
    per-node visit order unspecified — processing whole levels at once
    pins ONE deterministic result, which is what makes the sketch
    SQL-replayable as chained CTEs (the PageRank/Bellman-Ford recipe).

    Scale shape: ONE corpus-sized aggregation (the value histogram,
    map-side partial → grid-bounded); every round after operates on the
    grid-bounded (and shrinking) sketch relation — cost independent of
    row count, the same bounded-model story as DSIR/k-means.

    Returns ``(nodes, n)``: nodes (lvl, idx, cnt) with
    lo = idx·2^lvl, hi = (idx+1)·2^lvl − 1 derivable, and the exact
    total count n (one bounded 1-row collect). n < k ⇒ threshold 0 ⇒
    no compression ⇒ the sketch IS the exact histogram.
    """
    leaves = (
        df.select(F.col(value_col).cast("bigint").alias("idx"))
        .groupBy("idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    n = leaves.agg(F.sum("cnt")).collect()[0][0] or 0
    nodes = leaves.select(F.lit(0).alias("lvl"), "idx", "cnt")
    return _qdigest_compress(nodes, int(n), k, domain_bits), int(n)


def _qdigest_compress(
    nodes: DataFrame,
    n: int,
    k: int,
    domain_bits: int,
) -> DataFrame:
    """Level-synchronous canonical compression of a (lvl, idx, cnt) node
    relation (single-level for a fresh build; multi-level when merging
    digests — a pre-existing parent's own count joins its children's sum
    before the threshold test, per the classic violation rule).

    The whole ladder is ONE declarative linear plan: the state relation
    carries a ``frz`` flag instead of splitting into frozen/active
    branches, a pre-existing parent rides the family window as itself
    (lvl = l+1 → family key = idx, no pseudo-row union), and each round
    is one window (sum + row_number on the same partition spec → one
    exchange) plus row-wise CASEs, referencing the previous round
    EXACTLY once. Earlier shapes needed mid-loop localCheckpoints to
    stop copy-blowup (three references to the prior round) and spent
    ~1.7 s of physical planning per checkpoint — 27 s at sf0.01;
    this plan runs the same 24 rounds in one job with zero mid-loop
    planning. Determinism: row_number orders by (lvl DESC, idx),
    unique within a family."""
    thresh = n // k
    # SinglePartition satisfies every window's clustering requirement,
    # so the whole ladder plans as ONE exchange + domain_bits sorts in
    # one stage — no per-round shuffle. Sound at scale for the same
    # reason the dsir/ECDF models are: the relation entering the ladder
    # is the value HISTOGRAM, bounded by the price-grid cardinality
    # (and shrinking every round), never by row count.
    active = nodes.coalesce(1).selectExpr("lvl", "idx", "cnt", "false AS frz")
    for l in range(domain_bits):
        part = f"(NOT frz) AND (lvl = {l} OR lvl = {l + 1})"
        fkey = (
            f"CASE WHEN (NOT frz) AND lvl = {l} THEN idx >> 1 "
            f"WHEN (NOT frz) AND lvl = {l + 1} THEN idx END"
        )
        ann = active.selectExpr(
            "lvl",
            "idx",
            "cnt",
            "frz",
            f"sum(CASE WHEN {part} THEN cnt END) "
            f"OVER (PARTITION BY {fkey}) AS fs",
            f"row_number() OVER (PARTITION BY {fkey} "
            f"ORDER BY lvl DESC, idx) AS rn",
        )
        light = f"({part} AND fs <= {thresh})"
        active = ann.where(f"NOT ({light} AND rn > 1)").selectExpr(
            f"CASE WHEN {light} THEN {l + 1} ELSE lvl END AS lvl",
            f"CASE WHEN {light} AND lvl = {l} THEN idx >> 1 "
            f"ELSE idx END AS idx",
            f"CASE WHEN {light} THEN fs ELSE cnt END AS cnt",
            f"frz OR ({part} AND fs > {thresh} AND lvl = {l}) AS frz",
        )
    return active.select("lvl", "idx", "cnt")


def qdigest_merge(
    nodes_a: DataFrame,
    nodes_b: DataFrame,
    n_total: int,
    k: int = QDIGEST_K,
    domain_bits: int = QDIGEST_BITS,
) -> DataFrame:
    """Merge two q-digests: sum counts of identical (lvl, idx) nodes,
    then re-run the canonical compression against the COMBINED n's
    threshold. The 100 TB pattern: per-segment digests persist in a
    silver table and any union-of-segments quantile question is
    answered from sketches alone — no rescan (the HLL economics, for
    ranks). Error bounds add: each input contributes ≤ n_i·bits/k, so
    the merged digest stays within n_total·bits/k (law-tested)."""
    both = (
        nodes_a.unionByName(nodes_b)
        .groupBy("lvl", "idx")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return _qdigest_compress(both, n_total, k, domain_bits)


def qdigest_quantiles(
    nodes: DataFrame, n: int, q_bps: Sequence[int] = (2500, 5000, 7500, 9000, 9900)
) -> DataFrame:
    """Quantile estimates from a q-digest: nodes sort by
    (hi = (idx+1)·2^lvl − 1, lvl) — post-order, children before the
    ancestors that cover them — the running count accumulates, and the
    q-quantile estimate is the hi of the first node whose cumulative
    count reaches target = ceil(n·q). Quantile fractions ride as exact
    BASIS POINTS so target ranks are integers and the whole output is
    cross-engine hashable. The ordering window is a single partition
    over the SKETCH (≤ ~3k·bits nodes), never the data."""
    from pyspark.sql import Window

    ranked = nodes.select(
        F.col("lvl"),
        F.col("cnt"),
        F.expr(
            "(idx + 1) * shiftleft(CAST(1 AS BIGINT), CAST(lvl AS INT)) - 1"
        ).alias("hi"),
    ).withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("hi", "lvl").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    # Target ranks are plain Python ints (n is already collected, the
    # fractions are constants), so the per-quantile first-crossing reads
    # as conditional mins in ONE aggregate over the sketch — no
    # theta-join the plan census would have to excuse.
    targets = [(int(q), (n * int(q) + 9999) // 10000) for q in q_bps]
    row = ranked.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        *[
            F.min(F.when(F.col("cum") >= t, F.col("hi"))).alias(f"__e{q}")
            for q, t in targets
        ],
    )
    stack = ", ".join(
        f"CAST({q} AS BIGINT), CAST({t} AS BIGINT), __e{q}"
        for q, t in targets
    )
    return row.selectExpr(
        f"stack({len(targets)}, {stack}) AS (q_bp, target_rank, est_cents)",
        f"CAST({n} AS BIGINT) AS n_rows",
        "CAST(n_nodes AS BIGINT) AS n_nodes",
    )


# --- Count-Min Sketch (Cormode & Muthukrishnan 2005) -----------------------

#: default grid: 4 hash rows x 1024 counters = 4096 bigints per sketch.
CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_bucket(value, row, width: int):
    """Deterministic row-salted bucket: first 8 hex digits of
    md5("<row>|<value>") as a BIGINT, mod width — the registry's
    md5-bucket idiom (queries/text.py: doc fingerprints, dsir), chosen
    over Spark's hash() because DuckDB replays it verbatim
    (('0x' || substring(md5(...), 1, 8))::BIGINT % width), keeping the
    sketch integer-exact cross-engine."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", row.cast("string"), value)), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % width
    )


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-Min Sketch of a column as a (row, bucket, cnt) counter
    relation: ``depth`` independent md5-salted hash rows over ``width``
    counters each; a key's frequency estimate is the MIN of its
    ``depth`` counters (:func:`cms_point_estimates`) and NEVER
    undercounts — collisions only ever add.

    Fully deterministic (hash-based, no RNG) and MERGEABLE BY EXACT
    ADDITION: counters are plain sums, so summing two sketches'
    counters (:func:`cms_merge`) IS the sketch of the concatenated
    input, bit-for-bit — stronger than q-digest/HLL merging, which is
    only bound-preserving. That makes the silver-table economics exact:
    per-segment sketches sum into any union-of-segments sketch with no
    rescan and no approximation beyond the fixed grid.

    Scale shape: the explode multiplies the scan by ``depth`` CPU-side,
    but partial aggregation collapses each task's output to at most
    depth x width rows before the exchange, so the shuffle is GRID-
    bounded (depth x width x tasks), independent of row count — the
    same bounded-model story as dsir/k-means/q-digest."""
    rows = F.explode(
        F.array(*[F.lit(r) for r in range(depth)])
    ).alias("row")
    return (
        df.select(F.col(value_col).cast("string").alias("__v"))
        .select(rows, "__v")
        .select(
            "row",
            _cms_bucket(F.col("__v"), F.col("row"), width).alias("bucket"),
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(cms_a: DataFrame, cms_b: DataFrame) -> DataFrame:
    """Sum two CMS counter relations element-wise. EXACT: the result is
    bit-identical to ``cms_build`` over the concatenated inputs
    (law-tested), because counters are linear — no threshold, no
    recompression, no bound growth."""
    return (
        cms_a.unionByName(cms_b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_point_estimates(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Frequency estimates for a probe-key relation: re-derive each
    key's ``depth`` buckets, left-join the counter relation (an absent
    counter is an exact 0 — the key was never seen), and take the MIN
    across rows. Estimates OVERCOUNT or match, never undercount
    (est >= true for every key, law-tested).

    Join shape at scale: the sketch side is grid-bounded (<= depth x
    width rows), so it broadcasts; the probe side is keys x depth.
    Returns (key_col, est_cnt)."""
    probes = (
        keys.select(F.col(key_col))
        .distinct()
        .select(
            key_col,
            F.explode(
                F.array(*[F.lit(r) for r in range(depth)])
            ).alias("row"),
        )
        .select(
            key_col,
            "row",
            _cms_bucket(
                F.col(key_col).cast("string"), F.col("row"), width
            ).alias("bucket"),
        )
    )
    return (
        probes.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("est_cnt")
        )
    )


# --- AMS F2 / Tug-of-War sketch (Alon, Matias & Szegedy 1996) --------------

#: default estimator grid: 32 sign rows, medianed in 4 groups of 8.
AMS_ROWS = 32
AMS_GROUPS = 4


def _ams_sign(digest, row: int):
    """Deterministic ±1 sign for row ``row``: the parity of hex digit
    ``row + 1`` of the item's single md5 digest, mapped to {+1, -1}.
    One digest yields up to 32 signs (128 bits / 4 per hex char), so
    the scan hashes each item ONCE — not once per row. DuckDB replays
    it verbatim ((('0x' || substring(d, row+1, 1))::BIGINT % 2) and
    1 - 2*bit), keeping every counter integer-exact cross-engine."""
    bit = (
        F.conv(F.substring(digest, row + 1, 1), 16, 10).cast("bigint") % 2
    )
    return F.lit(1) - F.lit(2) * bit


def ams_build(
    df: DataFrame,
    value_col: str,
    rows: int = AMS_ROWS,
) -> DataFrame:
    """AMS "tug-of-war" sketch of a column as a (row, signed_sum)
    relation: ``rows`` ±1 sign functions (one md5 hex-digit parity
    each), each summed over every input item. Each row's square is an
    unbiased estimator of the second frequency moment F2 = Σ_k count(k)²
    — the self-join size, the quantity a planner wants for join-size /
    skew estimation without an exact per-key aggregate.

    Fully deterministic (hash signs, no RNG) and LINEAR: the sketch of
    a union is the element-wise SUM of the parts' sketches
    (:func:`ams_merge`), bit-for-bit — the same exact-merge economics
    as CMS, but for a quadratic statistic. State is ``rows`` bigints
    regardless of input size.

    Scale shape: ONE md5 per item and ``rows`` codegen'd sum
    aggregates over its hex digits — no explode, no row blowup; the
    partial aggregate carries ``rows`` counters per task and the final
    exchange is one row. (A row-salted explode variant — 32 md5s per
    item, 32x the rows — was the first implementation and measured
    2.1 s at sf0.1 / 4.2x at 100x; this shape removes both factors.)
    The one-row wide aggregate then unpivots to the (row, signed_sum)
    relation so merge/estimate compose relationally."""
    if rows > 32:
        raise ValueError("rows > 32 exceeds one md5 digest's hex digits")
    digest = F.md5(F.col(value_col).cast("string"))
    wide = df.select(digest.alias("__d")).agg(
        *[
            F.coalesce(F.sum(_ams_sign(F.col("__d"), r)), F.lit(0))
            .cast("bigint")
            .alias(f"s{r}")
            for r in range(rows)
        ]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"), F.col(f"s{r}").alias("signed_sum")
            )
            for r in range(rows)
        ]
    )
    return wide.select(F.explode(pairs).alias("p")).select(
        F.col("p.row").alias("row"),
        F.col("p.signed_sum").alias("signed_sum"),
    )


def ams_merge(ams_a: DataFrame, ams_b: DataFrame) -> DataFrame:
    """Sum two AMS sketches element-wise. EXACT: signed sums are linear
    in the input multiset, so the merged relation is bit-identical to
    ``ams_build`` over the concatenated inputs (law-tested)."""
    return (
        ams_a.unionByName(ams_b)
        .groupBy("row")
        .agg(F.sum("signed_sum").cast("bigint").alias("signed_sum"))
    )


def ams_f2_estimate(
    ams: DataFrame,
    rows: int = AMS_ROWS,
    groups: int = AMS_GROUPS,
) -> DataFrame:
    """Median-of-means F2 estimate from a sketch relation: square each
    signed sum (exact bigint), mean within each of ``groups`` groups of
    ``rows/groups`` consecutive rows, median across groups. With the
    default 4 groups the median of the sorted group sums is
    (g2 + g3) / 2, so the whole estimator is INTEGER arithmetic until
    one final division by ``2 * rows/groups`` — both engines convert
    the same exact bigints and divide by the same constant, giving
    identical doubles (the cross-engine discipline every certified
    float query in this registry follows).

    Error: each row's square is unbiased with variance ≤ 2·F2²; the
    mean-of-8 then median-of-4 brings the typical relative error to
    ~sqrt(2/8) ≈ 50% with exponentially small tail — a planner-grade
    magnitude estimate from 32 bigints of state (pinned against exact
    F2 in the registered queries). Returns one row: (est_f2 double)."""
    from pyspark.sql import Window

    if rows % groups:
        raise ValueError("rows must divide evenly into groups")
    per = rows // groups
    grouped = (
        ams.select(
            (F.col("row") / per).cast("bigint").alias("grp"),
            (F.col("signed_sum") * F.col("signed_sum")).alias("sq"),
        )
        .groupBy("grp")
        .agg(F.sum("sq").cast("bigint").alias("gsum"))
    )
    ranked = grouped.select(
        "gsum",
        F.row_number().over(
            Window.orderBy(F.col("gsum"), F.col("grp"))
        ).alias("rk"),
    )
    mid = ranked.where(
        F.col("rk").isin(groups // 2, groups // 2 + 1)
    )
    return mid.agg(
        (
            F.sum("gsum").cast("double")
            / F.lit(float(2 * per))
        ).alias("est_f2")
    )


def cms_inner_product(
    cms_a: DataFrame,
    cms_b: DataFrame,
) -> DataFrame:
    """Equi-join SIZE estimate between two keyed relations from their
    CMS counter relations (Cormode & Muthukrishnan 2005, §4.2): for
    each hash row, Σ_bucket cntA·cntB upper-bounds the true inner
    product Σ_k a_k·b_k (every matching key pair lands in the same
    bucket and all terms are non-negative, so collisions only ever
    ADD); the estimate is the MIN across rows and NEVER undercounts —
    the cross-relation companion of the AMS self-join size. All
    arithmetic is exact BIGINT (counters ≤ row count, products·width
    well under 2^53 at every certified scale).

    This is the planner-statistics use: size a fact⋈fact equi-join
    from two grid-bounded sketches built in one scan each — no key
    shuffle, no sampling, mergeable across segments by counter
    addition before probing. Returns one row (est_join_size bigint)."""
    prod = cms_a.select(
        "row", "bucket", F.col("cnt").alias("cnt_a")
    ).join(
        cms_b.select("row", "bucket", F.col("cnt").alias("cnt_b")),
        ["row", "bucket"],
    )
    per_row = prod.groupBy("row").agg(
        F.sum(F.col("cnt_a") * F.col("cnt_b")).cast("bigint").alias("ip")
    )
    return per_row.agg(
        F.min("ip").cast("bigint").alias("est_join_size")
    )
