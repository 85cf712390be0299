"""Connected components over near-duplicate pair edges → dedup clusters.

Near-dup detection (minhash/simhash/embedding banding) emits PAIRS; what
a curation pipeline actually needs is CLUSTERS — "these 7 docs are all
the same article" — so it can keep one canonical survivor per cluster.
Pairs → clusters is connected components, the one genuinely iterative
algorithm in the dedup family (gobulk has no analogue; its dedup is the
exact content-hash tier, tracker/gorm.go:441-449).

Implementation: distributed min-label propagation WITH pointer jumping.
Each round every node adopts the smallest label among itself and its
neighbours (one edge-list shuffle), then shortcuts through its current
label's label (one label-list self-join — "pointer doubling"). Plain
propagation needs diameter rounds; the jump halves the remaining label-
tree depth each round, so convergence is O(log diameter) — the same
bound as large-star/small-star (Kiveris et al., "Connected Components
in MapReduce and Beyond") with simpler per-round dataflow. Near-dup
graphs are near-cliques (2-3 rounds anyway); the jump is what makes an
adversarial long-chain graph safe at scale.

Scale notes: labels and edges are (long, long) pairs — narrow shuffles
regardless of document size; `localCheckpoint` truncates the iterative
lineage each round (the classic iterative-DataFrame OOM trap); the
convergence probe is an aggregate (`count`), never a collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _driver_union_find(pairs: list[tuple]) -> dict:
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    driver_threshold: int = 65536,
) -> DataFrame:
    """(node, cluster_id) for every node in `edges`; cluster_id is the
    smallest node id in the component (deterministic canonical label).

    Only nodes that appear in at least one edge are returned — isolated
    documents are their own cluster by definition and joining them in is
    the caller's (cheap, optional) left join.

    Size-aware execution: near-dup edge lists are usually TINY relative
    to the corpus (pairs above a high threshold), and the distributed
    loop costs ~3 jobs per round in scheduling alone — a 47-node graph
    pays seconds of latency to label what a driver union-find does in
    microseconds. Edge lists at or under ``driver_threshold`` rows are
    collected (bounded: 16 bytes/edge -> 1 MiB at the default) and
    solved exactly on the driver; larger graphs run the distributed
    pointer-jumping propagation. Both paths produce the identical
    min-label output (cross-checked in tests); pass 0 to force the
    distributed path.
    """
    # node-type-generic: long doc ids and string image ids both flow
    # through — min-label propagation only needs a total order, and
    # Spark least()/min() and the driver union-find's min() agree on
    # the same lexicographic order for strings, numeric for numbers
    # materialize the (usually expensive) upstream pair computation ONCE
    # before the symmetrization union: the union's two branches are two
    # copies of the same subtree, and Catalyst does not share them — a
    # jaccard candidate generation feeding dedup_clusters ran twice
    # (measured: 4.3 s of the 9.3 s leg at sf1.0) until this checkpoint
    ed0 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(
        eager=True
    )
    # the driver path works on the RAW pair list: union-find is
    # direction-agnostic and tolerant of duplicates, so the
    # symmetrize + dropDuplicates shuffle + second checkpoint exist
    # only for the distributed propagation below and are skipped here
    # (round 6; the 2x matches the old ed2-row threshold semantics)
    if driver_threshold and 2 * ed0.count() <= driver_threshold:
        labels_map = _driver_union_find(
            [(r["a"], r["b"]) for r in ed0.collect()]
        )
        spark = edges.sparkSession
        from pyspark.sql.types import StructField, StructType

        node_t = ed0.schema["a"].dataType
        return spark.createDataFrame(
            list(labels_map.items()),
            StructType(
                [StructField("node", node_t), StructField("cluster_id", node_t)]
            ),
        )
    ed2 = ed0.unionByName(ed0.select(F.col("b").alias("a"), F.col("a").alias("b")))
    ed2 = ed2.dropDuplicates(["a", "b"]).localCheckpoint(eager=True)
    labels = ed2.select(F.col("a").alias("node")).dropDuplicates(
        ["node"]
    ).withColumn("lbl", F.col("node"))
    for _ in range(max_iter):
        nbr_min = (
            ed2.join(labels, ed2["a"] == labels["node"])
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        merged = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(
                F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
            ).alias("lbl"),
        )
        # pointer jump: adopt the label OF my label. Labels are always
        # node ids (they originate as ids and only min-merge), so the
        # lookup self-join always hits; lbl(parent) <= parent makes
        # least() monotone. This is what turns a diameter-length chain
        # into O(log d) rounds. The parent table is the PREVIOUS
        # generation (`labels`, already checkpointed), not `merged`:
        # joining merged to itself would evaluate the un-pinned
        # edge-join/aggregate subtree twice per round — the exact
        # re-trigger cost dedup.pin exists to prevent — and synchronous
        # pointer doubling reads the prior generation anyway.
        parent = labels.select(
            F.col("node").alias("lbl"), F.col("lbl").alias("parent_lbl")
        )
        new_labels = (
            merged.join(parent, "lbl", "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("parent_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "with pointer jumping this needs diameter > 2^max_iter, which "
            "indicates a degenerate input (or raise max_iter)"
        )
    return labels.select("node", F.col("lbl").alias("cluster_id"))


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pairs → per-doc cluster assignment with cluster size.

    Output: (doc_id, cluster_id, cluster_size). The canonical survivor
    of each cluster is `cluster_id` itself (min id — same deterministic
    min-survivor rule as exact dedup, operators/dedup.py).
    """
    cc = connected_components(pairs, id_a, id_b)
    sizes = cc.groupBy("cluster_id").agg(F.count("*").cast("long").alias("cluster_size"))
    return (
        cc.join(sizes, "cluster_id")
        .select(
            F.col("node").cast("long").alias("doc_id"),
            F.col("cluster_id").cast("long"),
            "cluster_size",
        )
    )
