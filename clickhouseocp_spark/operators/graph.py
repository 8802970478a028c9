"""Connected components over near-duplicate pair graphs — the clustering
step every dedup pipeline runs AFTER pair generation (LSH/Jaccard emit
PAIRS; retention policy needs GROUPS: keep one representative per
component).  ClickHouse ships the same shape as a window of its dedup
tooling scope (the reference image's obfuscator/dedup utilities); the
published algorithm here is iterative min-label propagation (Hash-to-Min,
Rastogi et al., ICDE'13 — the MapReduce-native CC formulation).

Scale design: each iteration is ONE shuffle join keyed on vertex id; the
iteration count is bounded by the graph DIAMETER, and near-dup components
are short chains / quasi-cliques (diameter ≲ 3 in practice — a pair
generator with threshold t produces chains only where similarity decays
just below t per hop).  Labels persist between iterations and the loop
early-stops on a converged count — the driver sees one scalar per
iteration, never rows.  For adversarial long-chain graphs swap in
path-doubling (large-star/small-star) — same join primitive, O(log d)
iterations; not needed for the dedup workload this serves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Min-label propagation CC: every vertex ends with ``component`` = the
    smallest vertex id reachable from it.  ``nodes`` may contain vertices
    absent from ``edges`` (singletons label themselves).

    Each round: label(v) ← min(label(v), min over neighbors' labels);
    terminates when no label changes (≤ diameter rounds, capped by
    ``max_iter`` as a runaway guard).

    ``checkpoint_every``: truncate the label lineage every k rounds (0 =
    never, the local[32] default).  The loop persists each round, but the
    LOGICAL plan still grows by one join per round — on a real cluster a
    lost executor (evicted cache + shuffle files) replays the whole prefix,
    the classic iterative-algorithm lineage trap.  Set k (2-5) for cluster
    deployments: uses the reliable checkpoint dir when the session has one
    configured, else an eager ``localCheckpoint``.  See SCALE.md.
    """
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
    )
    labels = nodes.select(F.col(id_col).alias("v")).distinct().withColumn(
        "component", F.col("v")
    )
    labels.persist()
    labels.count()  # materialize before iterating
    for it in range(max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("v", "d2"), sym["d"] == F.col("d2"))
            .groupBy("s")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels["v"] == nbr_min["s"], "left")
            .select(
                "v",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            # eager checkpoint both materializes AND truncates the plan; a
            # plain persist only does the former (lineage still replays the
            # whole prefix after shuffle-file/cache loss on a cluster)
            sc = new_labels.sparkSession.sparkContext
            if sc.getCheckpointDir() is not None:
                new_labels = new_labels.checkpoint(eager=True)
            else:
                new_labels = new_labels.localCheckpoint(eager=True)
        new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    # labels stays persisted — the returned projection reads the cached
    # final iteration rather than replaying the whole lineage
    return labels.select(F.col("v").alias(id_col), "component")
