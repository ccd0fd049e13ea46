"""Distributed connected components — near-dup pairs → dedup clusters.

The dedup operators emit *pairs* (minhash/LSH candidates, winnowing
overlaps, embedding neighbors); a training-data pipeline needs *groups*
— one canonical survivor per duplicate cluster.  Pair→group is connected
components on the similarity graph, the standard last stage of web-scale
dedup (public algorithm family: hash-min label propagation; Kiveris et
al., "Connected Components in MapReduce and Beyond", for the
large-star/small-star variant of the same idea).

Implementation is pure DataFrame ops driven by a driver-side convergence
loop:

- each round, every vertex takes the min label among itself and its
  neighbors (one shuffle: join + groupBy-min);
- a pointer-jumping round (labels joined to labels) then halves the
  remaining propagation distance, so convergence is O(log diameter)
  rounds, not O(diameter);
- ``localCheckpoint`` truncates lineage every round — without it the
  plan doubles per iteration and the job dies on plan-compile time long
  before data size matters;
- convergence = a round in which no label decreased (labels only ever
  decrease, so this is a fixpoint, detected with a short-circuit
  ``limit(1).count()`` over the already-checkpointed round output).

At 100 TB the similarity graph is orders of magnitude smaller than the
corpus (|edges| tracks duplicate density), and every round is a pair of
balanced hash shuffles on vertex ids.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertices: DataFrame | None = None,
    id_col: str = "id",
    max_rounds: int = 50,
) -> DataFrame:
    """Label every vertex with the min vertex id of its component.

    ``edges`` is an undirected pair list (direction ignored, self-loops
    and duplicates tolerated).  ``vertices`` optionally supplies the full
    vertex set so isolated vertices appear in the output (as singleton
    components); otherwise only edge endpoints are labeled.

    Returns ``(id, component)`` with ``component`` = min id reachable.
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    sym = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    if vertices is not None:
        ids = vertices.select(F.col(id_col).cast("long").alias("id")).distinct()
    else:
        # Raw endpoints, not sym: a vertex named only by a self-loop is
        # still a (singleton) vertex.
        ids = (
            e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id")))
            .distinct()
        )
    labels = ids.select("id", F.col("id").alias("component")).localCheckpoint()

    for _ in range(max_rounds):
        # Round part 1: min over neighbor labels (the propagation shuffle).
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("id").alias("dst"), F.col("component").alias("dst_comp")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dst_comp").alias("nbr_comp"))
            .withColumnRenamed("src", "id")
        )
        stepped = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least(
                "component", F.coalesce("nbr_comp", "component")
            ).alias("component"),
            F.col("component").alias("prev"),
        )
        # Checkpoint before the self-join below: otherwise both join sides
        # re-execute this round's propagation subtree.
        stepped = stepped.localCheckpoint()
        # Round part 2: pointer jumping — follow component -> its component,
        # halving remaining chain length (labels only decrease, so jumping
        # through a stale pointer is still monotone-safe).
        jumped = stepped.join(
            stepped.select(
                F.col("id").alias("component"),
                F.col("component").alias("comp_comp"),
            ),
            "component",
            "left",
        ).select(
            "id",
            F.least(
                "component", F.coalesce("comp_comp", "component")
            ).alias("component"),
            "prev",
        )
        new_labels = jumped.localCheckpoint()
        labels = new_labels.select("id", "component")
        decreased = (
            new_labels.filter(F.col("component") < F.col("prev")).limit(1).count()
        )
        if decreased == 0:
            break
    sym.unpersist()
    return labels


def cluster_survivors(
    docs: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """Pick one canonical survivor per component: highest ``quality_col``
    (ties → lowest id), plus the member count — the decision record a
    dedup pass emits before dropping losers.

    One join on the id and one window per component; with no quality
    column the survivor is simply the min id (= the component label).
    """
    from pyspark.sql import Window

    joined = docs.join(
        labels.select(
            F.col("id").alias(id_col), F.col("component").alias("cluster")
        ),
        id_col,
    )
    order = (
        [F.col(quality_col).desc(), F.col(id_col)]
        if quality_col
        else [F.col(id_col)]
    )
    w = Window.partitionBy("cluster")
    return (
        joined.withColumn("__rn", F.row_number().over(w.orderBy(*order)))
        .withColumn("n_members", F.count(F.lit(1)).over(w).cast("long"))
        .filter(F.col("__rn") == 1)
        .select("cluster", F.col(id_col).alias("survivor_doc_id"), "n_members")
    )
