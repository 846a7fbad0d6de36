"""Transitive clustering: connected components over the match graph.

Not in the reference (it returns A→B pairs only, R/fuzzylink.R:461-491);
required by the build contract: iterative large-star / small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
expressed as DataFrame self-joins with checkpointed convergence.

Algorithm over an undirected edge set E ⊆ id×id (ids are long):
  large-star: for each node u, connect every strictly-larger neighbor v>u
              to m(u) = min(u, min neighbors of u)
  small-star: for each node u, connect every neighbor v<=u (and u itself)
              to m(u) computed over smaller-or-equal neighbors
  repeat until the edge set is a fixed point; result edges (u -> root)
  give the component assignment.

Each round is: symmetrize → groupBy min-neighbor → re-expand — two
shuffles per star. ``checkpoint_every`` cuts the lineage via
localCheckpoint (or a write/read-back when a checkpoint dir is set) so the
plan doesn't grow unboundedly across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical undirected edges (lo < hi), deduped, self-loops dropped."""
    return (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect larger neighbors to the min of each neighborhood (incl. self)."""
    sym = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    # strictly larger neighbors attach to m(u)
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect smaller-or-equal neighbors (and self) to the neighborhood min."""
    # orient edges so dst <= src, then group by the larger endpoint
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    attach = (
        oriented.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_edges = mins.select(F.col("src"), F.col("m").alias("dst"))
    return attach.unionAll(self_edges)


def _signature(edges: DataFrame) -> tuple[int, int]:
    """Cheap convergence fingerprint: (count, sum of xxhash64(src,dst))."""
    # modular hash summed as decimal: no ANSI long overflow at any row count
    h = (F.pmod(F.xxhash64("src", "dst"), F.lit(1_000_000_007))).cast("decimal(28,0)")
    row = edges.agg(F.count("*").alias("n"), F.sum(h).alias("h")).first()
    return (int(row["n"]), int(row["h"] or 0))


def _driver_union_find(edge_rows: list) -> list[tuple[int, int]]:
    """Exact union-find on a collected edge list; returns (id, root) with
    root = min id of the component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for src, dst in edge_rows:
        ra, rb = find(src), find(dst)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = set()
    for src, dst in edge_rows:
        nodes.add(src)
        nodes.add(dst)
    return [(n, find(n)) for n in nodes]


def connected_components(
    edges: DataFrame,
    max_iter: int = 50,
    checkpoint_every: int = 1,
    driver_finish_threshold: int = 2_000_000,
) -> DataFrame:
    """Component assignment DataFrame[id, component] (component = min id).

    ``edges`` is DataFrame[src long, dst long]. Deterministic; converges in
    O(log n) star rounds. Each star round CONTRACTS the graph (edges
    attach to neighborhood minima), so once the residual edge set fits
    ``driver_finish_threshold`` the exact tail runs as a driver-side
    union-find — the common case finishes in one distributed round plus a
    milliseconds-scale driver pass instead of 4-6 more shuffle rounds.
    Set the threshold to 0 to stay fully distributed.
    """
    spark = edges.sparkSession
    # materialize the canonical edges once: the caller's edge plan may be
    # expensive (e.g. a MinHash scan) and every star round / node scan
    # would otherwise recompute it
    cur = _canon(edges).localCheckpoint(eager=True)
    # all_nodes is a LAZY plan over the checkpointed edges (r6): the
    # driver-finish path below never evaluates it (the collected edge list
    # already names every node), and the distributed path's singleton scan
    # reads the checkpoint's cached blocks — the former eager second
    # checkpoint bought nothing
    cur0 = cur
    all_nodes = (
        cur0.select(F.col("src").alias("id"))
        .unionAll(cur0.select(F.col("dst").alias("id")))
        .distinct()
    )
    prev_sig = None
    n0 = cur.count()
    if 0 < n0 <= driver_finish_threshold:
        assign_rows = _driver_union_find([(r["src"], r["dst"]) for r in cur.collect()])
        # the collected edge list covers every node (all_nodes is src ∪ dst
        # of the same edges), so the assignment IS the full result: no
        # roots/singleton union or final distinct job needed (r6)
        return spark.createDataFrame(
            [(root, node) for node, root in assign_rows],
            schema="component long, id long",
        )
    else:
        for i in range(max_iter):
            # one canon/distinct per round (stars tolerate duplicate edges);
            # eager localCheckpoint keeps the signature job reading cached
            # blocks instead of recomputing the round chain
            cur = _canon(_small_star(_large_star(cur)))
            if (i + 1) % checkpoint_every == 0:
                cur = cur.localCheckpoint(eager=True)
            sig = _signature(cur)
            if sig == prev_sig:
                break
            if sig[0] <= driver_finish_threshold:
                # each round contracts the graph; once the residual fits,
                # finish exactly on the driver (emitted as node -> root)
                assign_rows = _driver_union_find(
                    [(r["src"], r["dst"]) for r in cur.collect()]
                )
                cur = spark.createDataFrame(
                    [(root, node) for node, root in assign_rows if node != root],
                    schema="src long, dst long",
                )
                break
            prev_sig = sig
    # converged edges are canonical (src < dst): src is the component root
    assign = cur.select(F.col("src").alias("component"), F.col("dst").alias("id"))
    roots = cur.select(F.col("src").alias("component")).distinct().select(
        "component", F.col("component").alias("id")
    )
    singletons = all_nodes.join(
        assign.select("id").unionAll(roots.select("id")), "id", "left_anti"
    ).select(F.col("id").alias("component"), "id")
    return (
        assign.unionByName(roots.select("component", "id"))
        .unionByName(singletons)
        .distinct()
    )


def pairwise_f1(pred_pairs: DataFrame, gold_pairs: DataFrame) -> dict[str, float]:
    """Pairwise precision/recall/F1 of predicted intra-cluster pairs vs gold
    pairs. Both inputs: DataFrame[a, b] with canonical ordering applied here."""
    def canon(df: DataFrame) -> DataFrame:
        return df.select(
            F.least(df.columns[0], df.columns[1]).alias("a"),
            F.greatest(df.columns[0], df.columns[1]).alias("b"),
        ).distinct()

    p = canon(pred_pairs)
    g = canon(gold_pairs)
    tp = p.join(g, ["a", "b"], "inner").count()
    np_, ng = p.count(), g.count()
    precision = tp / np_ if np_ else 0.0
    recall = tp / ng if ng else 0.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
    return {"precision": precision, "recall": recall, "f1": f1,
            "tp": float(tp), "pred": float(np_), "gold": float(ng)}


def clusters_to_pairs(assign: DataFrame, id_col: str = "id",
                      comp_col: str = "component") -> DataFrame:
    """Expand a component assignment to intra-cluster pairs (a<b) via a
    self-equi-join on component (for pairwise-F1 evaluation)."""
    left = assign.select(F.col(comp_col).alias("c"), F.col(id_col).alias("a"))
    right = assign.select(F.col(comp_col).alias("c"), F.col(id_col).alias("b"))
    return (
        left.join(right, "c")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
