"""Connected components over near-duplicate pairs → cluster ids.

The dedup ladder emits *pairs* (a ~ b); downstream consumers need
*clusters* — one id per transitively-connected group — for canonical
selection and leakage-safe splits (``deterministic_split`` on the
cluster id keeps a whole near-dup family in one split).

Components are computed by iterative min-label propagation with
POINTER JUMPING: every node starts as its own label; each round a
node adopts the smallest label among itself and its neighbors, and
then the label OF its label (labels are themselves node ids, so one
extra self-join squares the propagation distance — path-shaped
components converge in O(log diameter) rounds instead of
O(diameter), which a 10× corpus's denser pair graphs actually hit).
Each round is one join+aggregate over the edge list plus one label
self-join. ``localCheckpoint`` truncates the growing lineage every
round — without it the plan doubles per iteration and the job dies
on plan size long before data size.

This is the documented non-SQL-expressible island: iteration needs a
driver loop (Pregel-style), though each step is plain DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trisk_datawrangle_spark.operators.persist import (
    tracked_local_checkpoint,
    unpersist_ids,
)


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; the
    component id is the minimum node id in the group. Raises if the
    fixpoint is not reached within ``max_iter`` rounds (disconnected
    near-dup graphs converge in a few).

    Checkpoint hygiene: every round's frame is checkpointed DISK_ONLY
    and the superseded round's blocks are unpersisted as soon as the
    convergence check has consumed them — without this the storage of
    ALL rounds stays pinned until driver GC, and the sf10 probe OOMed
    the executor heap on exactly that accumulation (the blocks belong
    to the internal RDD, so ``DataFrame.unpersist`` can't reach them;
    see :mod:`trisk_datawrangle_spark.operators.persist`)."""
    spark = pairs.sparkSession
    edges, edge_ids = tracked_local_checkpoint(
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels, label_ids = tracked_local_checkpoint(
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy("u")
            .agg(F.min("comp").alias("nmin"))
        )
        propagated = labels.join(
            neighbor_min, labels.node == neighbor_min.u, "left"
        ).select(
            "node",
            F.least(
                F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))
            ).alias("comp"),
        )
        # pointer jump: my label is a node id whose own row may carry
        # a smaller label — adopting it squares the hop distance per
        # round (O(log diameter) total), keeping long path-shaped
        # components inside the iteration budget
        hop = propagated.select(
            F.col("node").alias("c_node"), F.col("comp").alias("c_comp")
        )
        new_labels, new_ids = tracked_local_checkpoint(
            propagated.join(hop, propagated.comp == hop.c_node, "left")
            .select(
                "node",
                F.least(
                    F.col("comp"),
                    F.coalesce(F.col("c_comp"), F.col("comp")),
                ).alias("comp"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        # the convergence check above was the old round's last reader
        unpersist_ids(spark, label_ids)
        labels, label_ids = new_labels, new_ids
        if changed == 0:
            unpersist_ids(spark, edge_ids)
            return labels
    unpersist_ids(spark, edge_ids)
    unpersist_ids(spark, label_ids)
    raise RuntimeError(f"not converged after {max_iter} rounds")


def dedup_clusters_pipeline(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    pair_tier: str = "lsh",
    num_hashes: int = 64,
    bands: int = 16,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Near-dup clustering end to end — pair generation through
    :func:`~trisk_datawrangle_spark.llm.dedup.near_dup_pairs`
    (``pair_tier`` defaults to the candidate-bounded LSH tier; the
    quadratic exhaustive join is ``pair_tier="exact"``, opt-in) fed
    into pointer-jumped :func:`connected_components`. Returns
    ``(id_col, cluster_id)`` for EVERY document (singletons are their
    own cluster). This is the named operator a corpus build reaches
    for; the scale-killing configuration is a parameter, not the
    default (r7 verdict #2)."""
    from trisk_datawrangle_spark.llm.dedup import near_dup_pairs

    pairs = near_dup_pairs(
        docs, text_col, id_col, n=n, threshold=threshold,
        pair_tier=pair_tier, num_hashes=num_hashes, bands=bands,
        max_doc_freq=max_doc_freq,
    )
    return dedup_clusters(docs, pairs, id_col=id_col)


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Every document with its cluster id: paired docs share their
    component's minimum id, singletons are their own cluster. Feed
    ``cluster_id`` to ``deterministic_split`` for leakage-safe
    train/test assignment."""
    comp = connected_components(pairs, src, dst)
    return (
        docs.select(id_col)
        .join(comp, docs[id_col] == comp.node, "left")
        .select(
            id_col,
            F.coalesce(F.col("comp"), F.col(id_col)).alias("cluster_id"),
        )
    )
