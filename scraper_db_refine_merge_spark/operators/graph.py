"""Connected components over a pair list — the clustering stage that turns
near-duplicate PAIRS (operators/dedup.py, operators/similarity.py) into
duplicate CLUSTERS for canonical-document selection.

The reference resolves duplicates pairwise at merge time (latest-wins per
business key); corpus dedup at 100 TB needs the transitive closure: if
A≈B and B≈C, all three form one cluster and one canonical survives. This
is an iterative algorithm — not SQL-expressible in one pass — so the
implementation is a driver-controlled loop of DataFrame joins (the driver
only ever sees one scalar per round, the changed-row count; all data stays
distributed).

Algorithm: min-label propagation + pointer jumping.
- start: label(v) = v
- each round: label(v) ← min(label(v), min over neighbors' labels)   (hop)
              label(v) ← label(label(v))                             (jump)
  The jump step halves chain lengths, giving O(log diameter) rounds —
  near-dup clusters are dense (quasi-cliques), so 2-3 rounds in practice.
- every round ends with a lineage-truncating materialization: iterative
  Spark without truncation re-executes the whole chain each round and
  eventually overflows the plan; checkpointing keeps each round O(1)
  plans. Like operators/ranking._pin_range_partitions (r11): RELIABLE
  ``checkpoint()`` when a checkpoint dir is configured (the production
  durability contract — executor loss mid-iteration recovers from the
  checkpoint files; persisted across the write so the round computes
  once, cleaned by cleanCheckpoints per the session factory),
  ``localCheckpoint(eager=True)`` otherwise (local mode, where executor
  loss is process death anyway).

Scale: each round is two hash-partitioned joins on node id (shuffle ∝
edges + nodes, AQE-coalesced); no collect of nodes/edges, no adjacency
matrix. Deterministic: labels are mins over a total order (the node id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _materialize(df: DataFrame) -> DataFrame:
    """Round-end lineage truncation (see module docstring): reliable
    checkpoint when a dir is configured, localCheckpoint otherwise."""
    if df.sparkSession.sparkContext.getCheckpointDir() is not None:
        d = df.persist()
        try:
            return d.checkpoint()
        finally:
            d.unpersist()
    return df.localCheckpoint()


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 25
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    the minimum node id reachable from the node. Undirected (edges are
    symmetrized); converges in O(log diameter) rounds, capped by
    ``max_iter`` (raises if the cap is hit before convergence)."""
    sym = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).unionByName(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    )
    # materialize sym FIRST: labels derives from it, so the other order
    # executed the upstream edge plan (often an expensive near-dup pair
    # join) twice — once under the labels materialization, again for sym
    sym = _materialize(sym)
    nodes = sym.select(F.col("s").alias("node")).distinct()
    labels = _materialize(nodes.select("node", F.col("node").alias("label")))

    for i in range(max_iter):
        # hop: pull the minimum label across neighbors. The round's INPUT
        # label rides along as __label0 so the convergence check below is
        # a filter-count over the round's already-materialized output —
        # the previous form joined new_labels back to labels on node, one
        # extra node-keyed shuffle join per round (r17, guide §2.4).
        nbr_min = (
            sym.join(labels.select(F.col("node").alias("d"), F.col("label").alias("nl")), "d")
            .groupBy("s")
            .agg(F.min("nl").alias("nbr_min"))
            .select(F.col("s").alias("node"), "nbr_min")
        )
        hopped = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.col("label").alias("__label0"),
                F.least(F.col("label"), F.coalesce("nbr_min", F.col("label"))).alias("label"),
            )
        )
        # jump: adopt the label of the current label (pointer doubling)
        jumped = (
            hopped.alias("h")
            .join(
                hopped.select(F.col("node").alias("label"), F.col("label").alias("ll")).alias("p"),
                "label",
                "left",
            )
            .select(
                F.col("h.node").alias("node"),
                F.col("h.__label0").alias("__label0"),
                F.least(F.col("label"), F.coalesce("ll", F.col("label"))).alias("label"),
            )
        )
        new_labels = _materialize(jumped)
        if i == 0 and max_iter > 1:
            # round 1 changes labels on any graph with a non-self edge
            # (labels start as self-ids, so the first hop adopts a smaller
            # neighbor somewhere) — skip its convergence count, one job
            # per CC build across q73/q98/q102/q110/q116/q141/q147 (r13,
            # VERDICT r12 item 8). A degenerate already-converged graph
            # (self-loops only) just pays one extra round before round
            # 2's check returns. max_iter=1 keeps the check (r13 review:
            # skipping it made a one-round convergence raise).
            labels = new_labels.select("node", "label")
            continue
        changed = new_labels.filter(F.col("label") != F.col("__label0")).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")


def dup_clusters(pairs: DataFrame, a_col: str = "a_id", b_col: str = "b_id") -> DataFrame:
    """(doc_id, cluster_id, cluster_size) for every doc in a near-dup pair
    list; cluster_id = min doc id of the cluster (the canonical survivor
    under keep-smallest-id policy)."""
    cc = connected_components(pairs, a_col, b_col)
    sizes = cc.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return cc.join(sizes, "component").select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        "cluster_size",
    )


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    scale: int = 1_000_000_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """PageRank with FIXED-POINT integer arithmetic — the engine's pattern
    for putting an iterative algorithm under a cross-engine oracle.

    Floating-point PageRank is not oracle-able: each iteration SUMs
    contributions in partition order, and double addition is not
    associative, so two engines (or two runs) drift in the last ulp and
    the drift compounds per iteration. Here ranks are BIGINTs scaled by
    ``scale``; per-edge contribution is ``rank div outdeg`` and the update
    is ``(15·r0) div 100 + (85·Σcontrib) div 100`` — every operation is
    exact integer arithmetic, so ANY execution order, partitioning, or
    engine produces identical bits. (The div-truncation loses mass
    vs. textbook PageRank — ranking order is preserved; documented
    semantics.)

    Iterations are unrolled DataFrame joins (rank ⋈ edges ⋈ outdeg →
    re-aggregate); the driver never sees data, and each iteration is one
    hash shuffle on node id. The node universe is the union of src AND dst
    (ADVICE r4: src-only silently dropped sink-only nodes from the output
    and from n on general directed graphs), so dangling nodes get the base
    rank; their outbound mass is dropped (like the contribution
    truncation) — symmetrize edges first if that matters.
    """
    # materialize the graph-shaped frames (the cache-the-edges shape every
    # iterative graph engine uses): each unrolled iteration references e,
    # deg and nodes again, and without a cut the whole upstream edge
    # construction (often a near-dup pair join) re-executes per reference —
    # exchange reuse is plan-shape-dependent, not guaranteed
    e = _materialize(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct())
    nodes = _materialize(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = _materialize(e.groupBy("src").agg(F.count("*").alias("outdeg")))
    n = nodes.count()  # one scalar on the driver — graph size, not data
    r0 = F.lit(scale // n).cast("long")
    base = F.lit((15 * (scale // n)) // 100).cast("long")

    rank = nodes.withColumn("r", r0)
    for _ in range(iterations):
        contrib = (
            e.join(rank, e.src == rank.node)
            .join(deg, "src")
            .select(F.col("dst").alias("node"), F.expr("r div outdeg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        rank = nodes.join(contrib, "node", "left").select(
            "node",
            (base + F.expr(f"{damping_pct} * coalesce(contrib, 0) div 100").cast("long")).alias("r"),
        )
    return rank.select("node", F.col("r").alias("rank_scaled"))


def fold_components(
    spark,
    target_path: str,
    new_pairs: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    max_iter: int = 25,
    keep_versions: int = 1,
) -> DataFrame:
    """Incremental connected components: fold a batch of new near-dup pairs
    into a stored (node, component) assignment without re-reading historical
    PAIRS.

    The stored assignment is itself a spanning forest — each (node,
    component) row is an edge to the cluster representative — so the union
    of those star edges with the new batch's pairs has exactly the same
    transitive closure as (all historical pairs + new pairs). Label
    propagation then runs over |nodes| + |new pairs| edges instead of the
    full pair history; cost per fold scales with the graph's NODE count and
    the batch, not with the ever-growing pair log. (A batch that merges two
    old clusters collapses them through their representatives in the first
    hop.) The refreshed assignment commits through the crash-safe versioned
    store (streaming/store.py: immutable snapshot + one atomic pointer
    replace; local/atomic-rename filesystems only).

    Equivalence with the from-scratch computation over the concatenated
    pair history is the tested invariant (tests/test_graph.py).
    """
    from ..streaming.store import store_commit, store_read

    e = new_pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    prior = store_read(spark, target_path)
    if prior is not None:
        # EVERY prior row becomes an edge — a singleton component (node ==
        # component) yields a harmless self-edge, which keeps the node in
        # the refreshed assignment. Filtering node != component here
        # silently dropped singleton components on refresh (ADVICE r4).
        star = prior.select(F.col("node").alias("s"), F.col("component").alias("d"))
        e = e.unionByName(star)
    out = connected_components(e, "s", "d", max_iter=max_iter)
    # keep_versions > 1 retains prior assignment snapshots for time travel
    # (store_read_version) — "which cluster was this doc in before batch N
    # folded?" is the provenance question canonical-selection audits ask.
    committed = store_commit(out, target_path, keep=keep_versions)
    return spark.read.parquet(committed)
