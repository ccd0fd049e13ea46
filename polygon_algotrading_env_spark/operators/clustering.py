"""Distributed k-means over embedding columns — the semantic-clustering
primitive (cluster-balanced curation, semantic dedup, topic bucketing for
mixture design) a training-data pipeline runs after embedding its corpus.

Two design decisions make the operator certifiable cross-engine while
keeping the plan the one you'd run at 100 TB:

- **Integer quantization** (the md5-tier recipe: certify an exact twin of
  the float production path): inputs are quantized to ``floor(x * 2^20)``
  BIGINTs — floor of an IEEE product is bit-deterministic on identical
  doubles, every distance is then EXACT integer arithmetic (dot products
  stay < 2^53, so even engines that route them through doubles are exact),
  and argmin ties break to the smallest centroid id identically on both
  engines. A float Lloyd iteration could flip an assignment on a last-ulp
  reorder; the quantized twin cannot.
- **Fixed rounds + bounded driver state** (the LPA / BPE recipe): Lloyd
  runs a pinned ``n_rounds``; the only driver-side data is the k x dim
  centroid table (KB-sized, independent of corpus scale — the PQ-codebook
  precedent), refreshed once per round from one per-(cluster, dim) sum
  aggregate. Assignment is one Arrow-vectorized ``pandas_udf`` carrying
  the centroid table in its closure — the Python boundary moves only the
  quantized vector in and (cid, dist) out per row, and each batch is a
  single exact-int64 NumPy broadcast (r15: the previous constant-array
  HOF expression evaluated the k x dim distance tree interpreted, three
  times per row). No join, no shuffle in the scan; the update aggregate
  shuffles k x dim partial sums after map-side combine.

Centroid update uses TRUNCATING integer division (DuckDB's ``//``
semantics, matched exactly on the driver) and keeps the previous centroid
for a cluster that loses all members, so the round recursion is replayable
as chained MATERIALIZED CTEs.

At 100 TB: per round = one corpus scan + one (cluster, dim)-keyed
aggregate whose post-combine size is k x dim rows per partition — the
textbook scalable Lloyd. Inertia sums are exact BIGINTs at fixture scale;
a trillion-row corpus would emit them as doubles (documented overflow
boundary ~2^53 of summed squared distance).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _truncdiv(s: int, n: int) -> int:
    """Integer division truncating toward zero — DuckDB's ``//`` on
    BIGINTs (Python's ``//`` floors, which differs on negative sums)."""
    t = abs(s) // n
    return t if s >= 0 else -t


def kmeans_quantized(
    emb: DataFrame,
    k: int = 8,
    n_rounds: int = 3,
    scale: int = 1 << 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[int]]]:
    """Fixed-round quantized Lloyd k-means. Returns (assignments, centroids)
    where assignments = (vec_id, cid, dist) under the FINAL centroids and
    centroids is the k x dim integer table (bounded driver state).

    Seeding is deterministic without an RNG: the k rows with the smallest
    ``md5(vec_id)`` (vec_id tie-break) in hash order — the repo's
    md5-uniform idiom, reproducible in SQL on any engine with md5."""
    # Lazy local checkpoint: the seeds collect below is the first action
    # over q and materializes the pin; an eager pin would spend one extra
    # driver-synchronized job on data every later pass re-reads anyway.
    q = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast(
                "long"
            ),
        ).alias("qv"),
    ).localCheckpoint(eager=False)

    seeds = (
        q.select(
            "vec_id", "qv", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h", "vec_id")
        .limit(k)
        .collect()
    )
    cents: list[list[int]] = [list(r["qv"]) for r in seeds]

    def assign(cents: list[list[int]]) -> DataFrame:
        # Arrow-vectorized assignment (r15, guide §4.2): the k x dim
        # centroid table rides inside the UDF closure and each batch is
        # one NumPy broadcast — exact int64 arithmetic (|q|,|c| < 2^21,
        # so (x-y)^2 summed over dim stays < 2^48), argmin's first-min
        # rule IS the smallest-cid tie-break. Replaces the nested
        # array-literal transform/zip_with/aggregate expression, whose
        # higher-order functions evaluate INTERPRETED and appear three
        # times per row (cid = array_position + array_min, dist =
        # array_min — no codegen, no subexpression elimination), and
        # whose ~k x dim literal tree re-enters analysis every round.
        # Measured at sf0.1 (fresh-JVM min-of-3): 3.25 s -> see
        # OPTIMIZATION_r15.md; bit-identical assignments (the clustering
        # law tests pin reference equality, tie-break, and partition
        # invariance). At 100 TB the shape is unchanged: one corpus scan,
        # no join, no shuffle — the Python boundary carries only qv in
        # and (cid, dist) out, batched by Arrow.
        carr = np.asarray(
            [[int(v) for v in cv] for cv in cents], dtype=np.int64
        )

        @F.pandas_udf("cid long, dist long")
        def _assign(qv: pd.Series) -> pd.DataFrame:
            if not len(qv):
                return pd.DataFrame({"cid": [], "dist": []})
            x = np.stack(qv.values).astype(np.int64, copy=False)
            d2 = ((x[:, None, :] - carr[None, :, :]) ** 2).sum(axis=2)
            cid = d2.argmin(axis=1)
            return pd.DataFrame(
                {
                    "cid": cid.astype(np.int64),
                    "dist": d2[np.arange(len(cid)), cid],
                }
            )

        s = _assign("qv")
        return q.select(
            "vec_id",
            "qv",
            s["cid"].alias("cid"),
            s["dist"].alias("dist"),
        )

    for _ in range(n_rounds):
        stats = (
            assign(cents)
            .select("cid", F.posexplode("qv").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by: dict[int, dict[int, tuple[int, int]]] = {}
        for r in stats:
            by.setdefault(r["cid"], {})[r["pos"]] = (r["s"], r["n"])
        new_cents = [
            [
                _truncdiv(by[ci][p][0], by[ci][p][1])
                for p in range(len(cents[ci]))
            ]
            if ci in by
            else cents[ci]
            for ci in range(k)
        ]
        # Checkpoint-proven early exit (the CC/BFS precedent): the next
        # centroid table is a pure function of the current one, so a
        # fixed point makes EVERY remaining round a no-op — skipping
        # them is bit-identical to the oracle's fixed n_rounds CTE
        # chain. Integer centroids make the fixed-point test exact, and
        # it costs zero extra jobs: the k x dim table is already on the
        # driver.
        converged = new_cents == cents
        cents = new_cents
        if converged:
            break

    return assign(cents), cents
