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
    # The edge set is the loop invariant: persist it so each round's plan
    # starts from the materialized (s, d) pairs instead of replaying the
    # whole pair-generation subtree (LSH banding / Jaccard verify) — across
    # ACTIONS Spark re-plans fresh RDDs, so nothing upstream is reused
    # unless it is cached (r15 measurement: the un-persisted loop re-ran
    # the full MinHash+LSH pipeline once per round).  ids only — bounded.
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .persist()
    )
    labels = nodes.select(F.col(id_col).alias("v")).distinct().withColumn(
        "component", F.col("v")
    )
    labels.persist()
    labels.count()  # materialize before iterating
    prev_ckpt_rdd = None  # previous round's localCheckpoint block owner
    for it in range(max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("v", "d2"), sym["d"] == F.col("d2"))
            .groupBy("s")
            .agg(F.min("component").alias("nbr_component"))
        )
        # carry the previous label through the update so convergence is a
        # filter-count on THIS round's (persisted) output — the old
        # separate new⨝old join cost one extra shuffle join per round
        new_labels = (
            labels.join(nbr_min, labels["v"] == nbr_min["s"], "left")
            .select(
                "v",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
                F.col("component").alias("__prev"),
            )
        )
        sc = new_labels.sparkSession.sparkContext
        if (
            checkpoint_every
            and (it + 1) % checkpoint_every == 0
            and sc.getCheckpointDir() is not None
        ):
            # reliable checkpoint both materializes AND survives executor
            # loss; see docstring (cluster knob)
            new_labels = new_labels.checkpoint(eager=True)
        else:
            # truncate the label lineage EVERY round: the logical plan
            # otherwise grows by one join per round and Catalyst re-analyzes
            # the whole prefix each iteration (plan explosion: the r14 final
            # CC plan carried 6k Exchange nodes — planning time, not
            # compute).  localCheckpoint is eager + cheap (labels are two
            # longs per vertex); fault tolerance of the intermediate is
            # covered by the checkpoint_every cluster knob above.
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.where(F.col("component") != F.col("__prev")).count()
        labels.unpersist()  # round-0 CacheManager entry; no-op afterwards
        # localCheckpoint blocks are RDD-level, not CacheManager entries, so
        # unpersist() above never frees them — drop the PREVIOUS round's
        # blocks explicitly now that this round is materialized (they'd
        # otherwise linger until ContextCleaner GC; r15 advice #3).  The
        # checkpointed RDD is the LogicalRDD behind the returned frame.
        try:
            ckpt_rdd = new_labels._jdf.queryExecution().analyzed().rdd()
        except Exception:  # plan shape differs (e.g. reliable checkpoint)
            ckpt_rdd = None
        if prev_ckpt_rdd is not None:
            try:
                prev_ckpt_rdd.unpersist(False)
            except Exception:
                pass
        prev_ckpt_rdd = ckpt_rdd
        labels = new_labels.drop("__prev")
        if changed == 0:
            break
    sym.unpersist()
    # the final labels are checkpointed/materialized — the returned
    # projection reads them rather than replaying the iteration lineage
    return labels.select(F.col("v").alias(id_col), "component")
