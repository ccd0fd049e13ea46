"""Deterministic 10x fixture scaling for bench.py's sf1 block.

The driver ships sf0.001/0.01/0.1 only; the 100 TB design claims deserve
at least one order-of-magnitude scaling data point, so the bench builds a
synthetic "sf1" (10x sf0.1) copy of EVERY table the headline suite reads
under a temp/workdir path (never under /root/testdata, which is
read-only by contract).

Scaling must preserve WORKLOAD SHAPE, not just row count:

- events: each replica shifts event_id by a disjoint block and ts by
  (span + 5 min) * replica, so the time range grows 10x → 10x bars with
  the same rows-per-bar density (replicating timestamps verbatim would
  instead deepen each bar, a different workload).
- documents: each replica applies a replica-keyed Caesar substitution to
  the letters (``translate`` — JVM-side, 1:1 so n_chars stays valid).
  A bijective charmap preserves every within-replica shingle-set Jaccard
  EXACTLY (near-dup structure intact), while cross-replica shingles
  differ wherever a letter appears, so replicas of the same doc are NOT
  near-dups — pair density stays linear in corpus size, as in a real
  10x corpus. Naive replication would put 10 copies of every doc in the
  same LSH buckets and inflate the band join quadratically.
- embeddings: vec_id shifts by a disjoint block; a small deterministic
  jitter (cos keyed on vec_id + component index) decorrelates replicas
  so ANN buckets fill 10x instead of holding 10 exact copies.
- TPC-H facts+dims (orders/lineitem/customer/part/supplier): each
  replica shifts every entity key by a disjoint block, CONSISTENTLY
  across tables so FK joins stay 1:1 — the entity domains grow 10x with
  per-entity depth unchanged, exactly how a real higher SF behaves
  (naive replication would instead give every part 10x lineitems: a
  depth change, not a scale change). region/nation stay fixed — TPC-H
  pins those dims at every SF.

Everything is a pure function of the source tables — no RNG, no clock —
so repeated builds are byte-stable and the build is cached behind a
marker file.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _scaled_events(spark: SparkSession, src_dir: str, factor: int) -> DataFrame:
    from polygon_algotrading_env_spark.catalog import load_table

    ev = load_table(spark, src_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span_us = int((hi - lo).total_seconds() * 1_000_000) + 300_000_000
    parts = [
        ev.select(
            (F.col("event_id") + r * 10**9).alias("event_id"),
            F.expr(f"timestampadd(MICROSECOND, {r * span_us}, ts)").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        for r in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _scaled_documents(
    spark: SparkSession, src_dir: str, factor: int
) -> DataFrame:
    from polygon_algotrading_env_spark.catalog import load_table

    docs = load_table(spark, src_dir, "documents")
    digits = "0123456789"
    parts = []
    for r in range(factor):
        # Each replica gets a SEEDED FULL PERMUTATION of letters and
        # digits (identity for r=0). Rotations don't survive large
        # factors: only 26 letter rotations exist, so replicas r and
        # r+26 would share the letter map and differ only in digits —
        # text-heavy docs then collide across replicas (observed 841k
        # cross-replica LSH pairs at factor=100). Two distinct random
        # permutations agree on ~1 character, so shingle sets across
        # replicas share ~nothing while within-replica Jaccard is
        # preserved exactly (still a bijection).
        if r == 0:
            rot, drot = _ALPHA, digits
        else:
            import random

            rng = random.Random(982451653 * r + 12345)
            la, dg = list(_ALPHA), list(digits)
            rng.shuffle(la)
            rng.shuffle(dg)
            rot, drot = "".join(la), "".join(dg)
        mapped = F.translate(
            F.translate(
                F.translate(F.col("text"), _ALPHA, rot),
                _ALPHA.upper(),
                rot.upper(),
            ),
            digits,
            drot,
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + r * 10**6).alias("doc_id"),
                mapped.alias("text"),
                "lang",
                "source",
                "n_chars",  # translate is 1:1 — length unchanged
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _scaled_embeddings(
    spark: SparkSession, src_dir: str, factor: int
) -> DataFrame:
    from polygon_algotrading_env_spark.catalog import load_table

    emb = load_table(spark, src_dir, "embeddings")
    parts = []
    for r in range(factor):
        jitter = float(0.03 * r)
        parts.append(
            emb.select(
                (F.col("vec_id") + r * 10**6).alias("vec_id"),
                F.transform(
                    F.col("embedding"),
                    lambda x, i: (
                        x + F.lit(jitter) * F.cos(i + F.col("vec_id"))
                    ).cast("float"),
                ).alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# Disjoint key-shift blocks: far above any key at the SFs we scale from.
_KEY_BLOCK = 10**8

# FK-consistent key columns per TPC-H table (shifted by replica * block).
_TPCH_KEYS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "customer": ("c_custkey",),
    "part": ("p_partkey",),
    "supplier": ("s_suppkey",),
}


def _scaled_tpch(
    spark: SparkSession, src_dir: str, table: str, factor: int
) -> DataFrame:
    from polygon_algotrading_env_spark.catalog import load_table

    df = load_table(spark, src_dir, table)
    keys = set(_TPCH_KEYS[table])
    parts = []
    for r in range(factor):
        cols = []
        for c in df.columns:
            if c in keys:
                cols.append((F.col(c) + r * _KEY_BLOCK).alias(c))
            elif table == "part" and c == "p_name" and r > 0:
                # Replica-keyed letter permutation (the documents
                # precedent): a real 10x catalog grows its NAME domain,
                # it doesn't stock 10 identical listings per (brand,
                # noun, size) cell. Verbatim replication saturates every
                # record-linkage block and turns the within-block
                # pairing quadratic — a workload-shape change, not a
                # scale change (observed: entity_resolution_parts 5-7x
                # time at 10x data before this, ~linear after).
                import random

                rng = random.Random(982451653 * r + 54321)
                la = list(_ALPHA)
                rng.shuffle(la)
                cols.append(
                    F.translate(F.col(c), _ALPHA, "".join(la)).alias(c)
                )
            else:
                cols.append(F.col(c))
        parts.append(df.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# Bump when the scaling transforms change: the cache marker embeds it, so
# a stale dir built by an older algorithm is rebuilt instead of silently
# benchmarked (v2 = seeded-permutation charmaps; v3 = +TPC-H tables;
# v4 = part-name permutation per replica so record-linkage blocks scale
# linearly like a real catalog).
SCALE_ALGO_VERSION = 4


def build_scaled_fixtures(
    spark: SparkSession, src_dir: str, dst_dir: str, factor: int = 10
) -> str:
    """Build (once; marker-cached) the scaled fixture dir and return it."""
    import shutil

    marker = os.path.join(dst_dir, "_BUILT")
    stamp = f"v={SCALE_ALGO_VERSION} factor={factor} src={src_dir}\n"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == stamp:
                return dst_dir
        shutil.rmtree(dst_dir, ignore_errors=True)  # stale algorithm/params
    os.makedirs(dst_dir, exist_ok=True)
    import functools

    builders = {
        "events": _scaled_events,
        "documents": _scaled_documents,
        "embeddings": _scaled_embeddings,
        **{
            t: functools.partial(_scaled_tpch, table=t)
            for t in _TPCH_KEYS
        },
    }
    for name, build in builders.items():
        build(spark, src_dir, factor=factor).write.mode("overwrite").parquet(
            os.path.join(dst_dir, f"{name}.parquet")
        )
    # region/nation: fixed dims at every SF — copy verbatim
    from polygon_algotrading_env_spark.catalog import load_table

    for name in ("region", "nation"):
        load_table(spark, src_dir, name).write.mode("overwrite").parquet(
            os.path.join(dst_dir, f"{name}.parquet")
        )
    with open(marker, "w") as f:
        f.write(stamp)
    return dst_dir
