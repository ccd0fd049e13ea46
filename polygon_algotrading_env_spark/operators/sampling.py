"""Deterministic sampling / splitting / packing for training-data curation.

The reference's only sampling is `random.shuffle` of the work order
(`main.py:36`, `old_source/old_source_op.py:211`); a training-data engine
needs reproducible, engine-independent versions of the real curation ops:

- ``hash_split``     — train/val/test assignment by content hash of a key:
                       stable under reruns, insertions, repartitioning, and
                       engine choice (md5 is identical everywhere, unlike
                       seeded RNG sampling whose stream is engine-private).
- ``per_group_downsample`` — cap each group (language, source, domain) at N
                       rows, chosen by hash order — balanced corpora without
                       a full sort.
- ``pack_by_token_budget`` — assign documents to fixed-token context
                       windows (greedy, in key order) with a window cumsum —
                       no Python, no per-row state.

All three are window/expression compositions — no shuffles beyond the
one hash partition by group key, no UDFs, SQL-expressible (and therefore
DuckDB-oracle-checked end to end).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _hex_hash(key: Column) -> Column:
    """First 4 hex chars of md5 — a uniform label in ['0000','ffff'] that
    any engine reproduces bit-for-bit from the same key string."""
    return F.substring(F.md5(key.cast("string")), 1, 4)


def hash_split(
    df: DataFrame,
    key_col: str,
    cuts: Sequence[tuple[str, str]] = (("train", "cccc"), ("val", "e666")),
    rest_label: str = "test",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic split assignment by hashed key.

    ``cuts`` are (label, exclusive-upper-hex-bound) pairs over the first 4
    md5 hex chars; rows at or past the last bound get ``rest_label``.  The
    defaults approximate 80/10/10.  Rows hash to the same split in every
    run, every engine, and regardless of what other rows exist — the
    property that matters for leakage-free train/test separation.
    """
    h = _hex_hash(F.col(key_col))
    expr = F.lit(rest_label)
    for label, bound in reversed(list(cuts)):
        expr = F.when(h < F.lit(bound), F.lit(label)).otherwise(expr)
    return df.withColumn(split_col, expr)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    strata_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum sampling at deterministic, engine-independent rates.

    ``sampleBy`` draws from a seeded RNG — engine-private, order-sensitive
    under retries. This instead keeps a row iff the first 4 md5 hex chars
    of its key fall below ``fraction × 16⁴``: the same rows survive every
    run, every engine, and (the property curation needs) a row's fate
    never depends on what other rows exist. Zero shuffles — a pure filter.
    """
    h = _hex_hash(F.col(key_col))
    expr = F.lit(format(int(default_fraction * 0x10000), "04x"))
    for label, frac in fractions.items():
        bound = format(min(int(frac * 0x10000), 0x10000), "04x")
        expr = F.when(F.col(strata_col) == label, F.lit(bound)).otherwise(expr)
    return df.filter(h < expr)


def winsorize_per_group(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    lower: float = 0.01,
    upper: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Clip ``value_col`` to its per-group [lower, upper] exact quantiles —
    the standard outlier guard before a numeric column feeds training or
    indicator math.

    Plan shape: the quantile pair comes from a groupBy aggregate and
    joins back via broadcast (group columns are low-cardinality by
    nature) — row-level work never redistributes. The tempting
    window-over-group formulation is a scale trap: it funnels EVERY row
    through one reducer per group value. Exact ``percentile`` keeps the
    clip reproducible cross-engine (approx sketches are engine-private);
    at 100 TB swap in ``approx_percentile`` and keep this as the audit
    path, as with ``exact_percentiles_per_flag``.
    """
    groups = list(group_cols)
    bounds = df.groupBy(*groups).agg(
        F.expr(f"percentile({value_col}, {lower})").alias("__lo"),
        F.expr(f"percentile({value_col}, {upper})").alias("__hi"),
    )
    return (
        df.join(F.broadcast(bounds), groups)
        .withColumn(
            out_col or f"{value_col}_winsorized",
            F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
        )
        .drop("__lo", "__hi")
    )


def per_group_downsample(
    df: DataFrame, group_cols: Sequence[str], key_col: str, cap: int
) -> DataFrame:
    """Keep at most ``cap`` rows per group, selected by hash order of the
    key (deterministic, unbiased w.r.t. any data ordering).

    One shuffle on the group key; rank-within-group is a window, and the
    cap predicate lets Spark stop tracking rank past ``cap``.
    """
    w = Window.partitionBy(*group_cols).orderBy(
        _hex_hash(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def pack_by_token_budget(
    df: DataFrame,
    token_col: str,
    budget: int,
    group_cols: Sequence[str] = (),
    order_col: str = "doc_id",
    window_col: str = "context_window",
) -> DataFrame:
    """Assign each row to a context-window id by greedy accumulation in
    ``order_col`` order: window k holds the rows whose running token total
    BEFORE the row lies in [k·budget, (k+1)·budget).

    The rule is a pure prefix-sum — ``floor(cumsum_before / budget)`` —
    so it is one window pass (per group), engine-independent, and lets a
    100 TB corpus pack in a single shuffle on the group key.  A document
    longer than the budget gets its own window(s) boundary-aligned, same
    as sequence-packing preprocessors handle oversized docs.
    """
    keys = [F.col(c) for c in group_cols]
    w = (
        Window.partitionBy(*keys).orderBy(order_col)
        if group_cols
        else Window.partitionBy().orderBy(order_col)
    )
    cum_before = F.sum(F.col(token_col)).over(w) - F.col(token_col)
    return df.withColumn(
        window_col, F.floor(cum_before / F.lit(budget)).cast("long")
    )


def quality_cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    quality_col: str,
    cap: int,
    tie_col: str | None = None,
) -> DataFrame:
    """Keep the ``cap`` HIGHEST-``quality_col`` rows per group — the
    frequency-cap curation rule ("at most N docs per domain, best first")
    that balances a crawl corpus without discarding quality signal.

    Same single-shuffle shape as :func:`per_group_downsample`; ties break
    on ``tie_col`` (default: the quality column's row identity is left to
    the caller — pass a unique column for deterministic output).
    """
    order = [F.col(quality_col).desc()]
    if tie_col:
        order.append(F.col(tie_col).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def curriculum_buckets(
    df: DataFrame,
    order_cols: Sequence[str],
    n_stages: int,
    group_cols: Sequence[str] = (),
    stage_col: str = "stage",
) -> DataFrame:
    """Assign each row a curriculum stage 1..``n_stages`` by ``ntile`` over
    ``order_cols`` (e.g. ascending document length: short/easy docs first).

    ``ntile`` gives equal-size stages without computing quantile cut
    points; one window pass (per group). Unpartitioned use funnels through
    a single task — fine for driver-sized relations; pass ``group_cols``
    (e.g. language) at corpus scale.
    """
    keys = [F.col(c) for c in group_cols]
    w = (
        Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_cols])
        if group_cols
        else Window.partitionBy().orderBy(*[F.col(c) for c in order_cols])
    )
    return df.withColumn(stage_col, F.ntile(n_stages).over(w).cast("int"))


def weighted_sample_per_group(
    df: DataFrame,
    weight_col: str,
    k: int,
    group_cols: Sequence[str] = (),
    key_col: str = "doc_id",
    out_col: str = "es_key",
) -> DataFrame:
    """Weighted sampling without replacement, deterministic: keep the k
    rows per group with the largest Efraimidis–Spirakis keys
    ``u^(1/w)`` — computed as ``ln(u)/w`` (same ordering, better
    conditioning) with ``u`` derived from the row key's md5, not an RNG.

    P(row selected) is proportional to its weight, exactly the
    reservoir-sampling guarantee — but because ``u`` is a hash, the
    sample is REPRODUCIBLE across runs and engines and stable under
    partitioning, which seeded ``sample()`` is not (Spark's RNG is
    per-partition-split dependent). Quality-weighted corpus subsampling
    ("keep ~10%, favor high quality") is this with w = quality.

    Weights must be > 0 (enforced); one window per group, single shuffle.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = F.col(weight_col)
    guarded = F.when(w > 0, w).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"weighted_sample_per_group: non-positive {weight_col}: "),
                w.cast("string"),
            )
        )
    )
    # u in (0, 1): 48 md5 bits shifted off zero — ln(u) stays finite.
    u = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 48))
    es_key = F.log(u) / guarded
    win = Window.partitionBy(
        *[F.col(c) for c in group_cols]
    ).orderBy(F.desc(out_col), F.col(key_col))
    return (
        df.withColumn(out_col, es_key)
        .withColumn("__rn", F.row_number().over(win))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def mixture_resample(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    key_col: str = "doc_id",
) -> DataFrame:
    """Resample to TARGET mixture proportions with maximum retention —
    the domain-reweighting step of training-data assembly ("make the
    corpus 40% en / 15% each of the rest") as a deterministic plan.

    The scale factor c = min_g(N_g / w_g) makes the scarcest-relative-to-
    target group the binding constraint (it keeps ~everything); every
    group's quota is t_g = floor(w_g · c), so realized proportions match
    the targets to within rounding and NO group is oversampled. Quota
    membership is hash-order rank (md5 of the row key, ties by key), the
    repo's reproducible-sampling idiom: stable across runs, engines, and
    partitionings, unlike seeded sample(). Groups absent from ``weights``
    are dropped. A weight group with ZERO rows in the data is an error:
    c = min(n/w) would be 0 and the realized mixture could silently stop
    matching the declared targets (the check is a len(weights)-bounded
    metadata collect, not a data funnel). One count aggregate
    (group-sized), one broadcast of the quota table, one per-group rank
    window — the fact shuffles once.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be > 0")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(g, float(w)) for g, w in weights.items()], [group_col, "wt"]
    )
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    j_all = F.broadcast(wdf).join(counts, group_col, "left")
    missing = [
        r[group_col]
        for r in j_all.where(F.col("n").isNull()).select(group_col).collect()
    ]
    if missing:
        raise ValueError(
            f"weight groups absent from data: {sorted(missing)} — every "
            "target-mixture group needs >=1 row (c = min(n/w) would be 0 "
            "and the realized mixture would not match the targets)"
        )
    j = counts.join(F.broadcast(wdf), group_col)
    c = j.agg(F.min(F.col("n") / F.col("wt")).alias("c"))
    targets = (
        j.crossJoin(F.broadcast(c))
        .select(group_col, F.floor(F.col("wt") * F.col("c")).alias("quota"))
    )
    rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 4),
            F.col(key_col),
        )
    )
    return (
        df.join(F.broadcast(targets), group_col)
        .withColumn("__rn", rn)
        .where(F.col("__rn") <= F.col("quota"))
        .drop("__rn", "quota")
    )
