"""Distributed connected components (SURVEY §2.L dedup extension).

The corpus-curation primitive the pair-level near-dup operators feed
into: near-duplicate *pairs* form a graph, and "keep one document per
duplicate group" means labeling each node with its connected component,
then keeping the minimum id per component. The reference has no graph
surface at all (its dedup story is the per-row merge modes,
cubicerpetl/cubicerpetl.py:494-537); this is the engine-native,
at-scale form.

Algorithm: iterative min-label propagation — every node starts labeled
with its own id; each round, every node adopts the minimum label among
itself and its neighbors; fixpoint = component ids. This is the standard
distributed CC formulation (GraphX/GraphFrames use the same shape with
the large-star/small-star optimization); rounds ≤ graph diameter, and
near-dup graphs are shallow (dup clusters are dense, so diameters are
tiny — typically ≤ 5 rounds).

Scale posture per round: one shuffle of the edge list joined to the
current labels, one min-aggregation on node id. Labels are
`localCheckpoint`ed every round so lineage (and the recompute cost of a
lost executor) stays O(1) in the round count, not O(rounds). The
convergence test is a single scalar aggregate (sum of labels — strictly
decreasing until fixpoint), never a `collect()` of node data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from cubicerp_client_etl_spark.checkpointing import pin


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with its connected component id (the minimum
    node id in the component, under the node column's NATIVE ordering —
    numeric ids compare numerically, string ids lexicographically).
    ``edges`` may be directed; it is symmetrized internally, so (a,b)
    and (b,a) are equivalent inputs.

    CONTRACT: ``nodes`` must contain every edge endpoint. The label
    table is keyed on ``nodes`` (the r15 left-join update); an edge
    endpoint absent from ``nodes`` neither receives a label nor
    propagates one (the pre-r15 union-based form would have grown the
    label table with such strays mid-iteration). All in-repo callers
    pass the full entity table the edges were derived from.

    Returns ``(node, component)``.
    """
    # Symmetrize once; propagation then only needs src→dst flow.
    fwd = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    sym = fwd.union(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    ).transform(pin)

    # Labels stay in the node id's native (orderable) type: casting to
    # long would silently NULL out string ids like 'c:123'/'s:45'.
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("label")
    ).transform(pin)

    # FRONTIER propagation (r16, guide §2.3 "shuffle fewer bytes"): a
    # node's outgoing message in round k is its label — identical to
    # the message it sent the round after its label last changed, and
    # already folded into every neighbor's min. So only nodes whose
    # label CHANGED last round need to re-send; the edge join's label
    # side shrinks from |V| every round to the (rapidly emptying)
    # changed set. Same fixpoint by min-monotonicity — round k's labels
    # are min-over-distance-≤k either way — and the convergence round
    # count is unchanged (an all-nodes round k changes nothing exactly
    # when the frontier round k changes nothing).
    frontier = labels
    for _ in range(max_iter):
        # neighbor labels flowing along edges — frontier senders only
        prop = (
            sym.join(frontier, sym.src == frontier.node)
            .select(F.col("dst").alias("node"), "label")
        )
        # One keyed min over incoming labels, then ONE left join back to
        # the label table computes the new label AND the convergence
        # flag together (min-label monotonicity: a label changes iff the
        # best incoming label is strictly smaller). The previous form
        # unioned all |V| labels into the aggregate and then ran a
        # SECOND |V|-row join purely as the probe — one full join per
        # round saved, same fixpoint, same values.
        min_in = prop.groupBy("node").agg(F.min("label").alias("_plabel"))
        upd = (
            labels.join(min_in, "node", "left")
            .select(
                "node",
                F.least("label", "_plabel").alias("label"),
                (F.col("_plabel") < F.col("label")).alias("_chg"),
            )
            .transform(pin)  # truncate lineage per round
        )
        # Scalar convergence probe (type-agnostic, no collect of node
        # data): count of nodes whose label changed this round — rides
        # the already-materialized checkpoint blocks.
        changed = upd.filter(F.col("_chg")).count()
        labels = upd.select("node", "label")
        # next round's senders = exactly the changed nodes (reads the
        # same checkpoint blocks the probe count just materialized)
        frontier = upd.filter(F.col("_chg")).select("node", "label")
        if changed == 0:
            break

    return labels.select("node", F.col("label").alias("component"))


def pagerank_int(
    edges: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    unit: int = 10**9,
) -> DataFrame:
    """Fixed-iteration PageRank in exact integer arithmetic.

    Ranks are held in integer "units" (1.0 == ``unit``) and every step
    uses integer division — so the result is bit-identical under ANY
    partitioning, accumulation order, or engine. Floating-point
    PageRank can never hash-match across engines (neighbor sums are
    order-dependent in double); integer units make the whole recursion
    exact. rank = (1-d) + d * Σ rank(v)/deg(v), computed as
    ``(100-d)% * unit / 100 + d * Σ(rank div deg) div 100``.

    Overflow posture: the damping product is computed via the EXACT
    decomposition ``(d*s) div 100 == d*(s div 100) + (d*(s mod 100))
    div 100``, so no intermediate ever exceeds the inflow sum ``s``
    itself. ``s`` is bounded by the total rank mass ≈ |V| × unit, so
    int64 is safe while |V| × unit < 2^63 — with the default
    unit=10**9 that is ~9.2 billion nodes, comfortably past the 100 TB
    design point (the prior unit=10**12 default overflowed at hub
    nodes once aggregate inflow passed ~1.1e5 rank-units).

    ``edges`` is (src, dst) DIRECTED; pass both directions for an
    undirected graph. Nodes with no in-edges keep the teleport term.

    Scale posture per iteration: one shuffle joining ranks to edges on
    src (edges pre-partitioned on src would make it co-located), one
    sum-aggregation on dst. Lineage is localCheckpointed per round so
    recovery cost stays O(1); total work is O(iterations × |E|) — the
    standard distributed formulation (GraphX uses the same shape).
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # Loop-invariant hoist: attach each edge's out-degree ONCE and pin
    # the result (plus the node set) with a checkpoint. The previous
    # form re-joined deg inside every iteration AND recomputed the
    # caller's edge pipeline (often a join+distinct over fact tables)
    # once per round — 5 iterations paid the edge build 5 times.
    ed = edges.join(deg, "src").select("src", "dst", "deg").transform(pin)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .transform(pin)
    )
    base = F.lit((100 - damping_pct) * unit // 100).cast("long")
    ranks = nodes.select("node", F.lit(unit).cast("long").alias("units"))
    for _ in range(iterations):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select(
                F.col("dst"),
                F.expr("units div deg").cast("long").alias("c"),
            )
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(inflow, nodes.node == inflow.dst, "left")
            .select(
                "node",
                (
                    base
                    # exact (d*s) div 100 without the d*s intermediate:
                    # d*(s div 100) + (d*(s mod 100)) div 100
                    + F.expr(
                        f"CAST({damping_pct} AS BIGINT) * (coalesce(s, 0) div 100)"
                        f" + (CAST({damping_pct} AS BIGINT)"
                        f" * (coalesce(s, 0) % 100)) div 100"
                    )
                ).cast("long").alias("units"),
            )
        )
        ranks = ranks.transform(pin)
    return ranks


def pointer_jump_roots(
    nodes: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    rounds: int = 5,
    validate: bool = False,
) -> DataFrame:
    """Resolve every node of a forest to its root + depth by POINTER
    JUMPING (path doubling): each round replaces every node's pointer
    with its pointer's pointer and adds the distances, so ``rounds``
    iterations cover hierarchies up to depth ``2^rounds`` in
    ``rounds`` self-joins — the scalable form of the recursive-CTE
    ancestor walk (which needs one join PER LEVEL and at 100 TB a
    12-level hierarchy costs 12 shuffles; doubling costs 4).

    Input: one row per node, ``parent_col`` = parent id; ROOTS point to
    themselves. Output: ``(node_col, root, depth)`` exact integers.

    Roots are fixpoints (self-pointer, distance 0), so extra rounds are
    harmless no-ops — choose ``rounds`` ≥ log2(max expected depth).
    Each round is one equi-join keyed on the pointer (AQE-managed);
    lineage is cut per round with localCheckpoint, the
    ``connected_components`` discipline.

    The per-round join is a LEFT join: a node whose parent id is absent
    from the input (dangling pointer — a violated contract) keeps its
    current pointer instead of being silently DROPPED from the output
    (the inner-join failure mode). ``validate=True`` additionally
    asserts every returned ``root`` is a true self-fixpoint — catching
    both dangling pointers and an insufficient ``rounds`` — at the cost
    of one count action over a semi-join.
    """
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    cur = nodes.select(
        F.col(node_col).alias("_n"),
        F.col(parent_col).cast("long").alias("_p"),
        F.when(F.col(parent_col) == F.col(node_col), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("_d"),
    )
    for _ in range(rounds):
        m = cur.select(
            F.col("_n").alias("_mn"), F.col("_p").alias("_mp"), F.col("_d").alias("_md")
        )
        cur = (
            cur.join(m, cur["_p"] == m["_mn"], "left")
            .select(
                "_n",
                F.coalesce(F.col("_mp"), F.col("_p")).alias("_p"),
                (F.col("_d") + F.coalesce(F.col("_md"), F.lit(0))).alias("_d"),
            )
            .transform(pin)
        )
    out = cur.select(
        F.col("_n").alias(node_col),
        F.col("_p").alias("root"),
        F.col("_d").alias("depth"),
    )
    if validate:
        fix = nodes.filter(F.col(parent_col) == F.col(node_col)).select(
            F.col(node_col).cast("long").alias("root")
        )
        n_bad = out.join(fix, "root", "left_anti").count()
        if n_bad:
            raise ValueError(
                f"pointer_jump_roots: {n_bad} nodes resolved to a non-root "
                f"ancestor — dangling parent pointers in the input, or "
                f"rounds={rounds} < log2(max depth)"
            )
    return out


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global triangle census of an undirected graph — triangle count
    plus the degree-sum wedge count and the global clustering
    coefficient (3·triangles/wedges, ×10⁶ floor) — the cohesion
    datasheet for co-occurrence graphs (co-purchase, co-citation,
    near-dup adjacency).

    Algorithm: DEGREE ORIENTATION (the standard distributed form —
    Suri & Vassilvitskii 2011's MR triangle counting): orient every
    edge from its (degree, id)-smaller endpoint to the larger; each
    node's ORIENTED out-degree is O(√m), so the wedge self-join emits
    O(m^{3/2}) rows worst-case instead of Σd² — the hub-node blowup a
    naive adjacency self-join hits on power-law graphs. A wedge
    a→b, a→c (b ordered below c) closes into a triangle iff the
    oriented edge b→c exists — one more equi-join. Every triangle is
    counted exactly once (its orientation-minimal vertex is unique).

    Input edges may be directed/duplicated — normalized to distinct
    undirected pairs first. Self-loops are dropped. Exact integer
    arithmetic; one row out: ``(n_nodes, n_edges, n_wedges,
    n_triangles, clustering_e6)``. Scale: degree table is
    node-bounded; all joins are equi-joins on node ids; no window, no
    collect.
    """
    # NOTE (r15 measured): the normalized edge list feeds three
    # subtrees, but their exchanges canonicalize identically, so AQE's
    # runtime exchange reuse already dedupes the recompute — an
    # explicit checkpoint bought 0% here and OOMed small-heap sessions
    # (edge-sized block-manager storage). Left uncheckpointed.
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    ed = e.join(du, "u").join(dv, "v")
    lower_is_u = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ed.select(
        F.when(lower_is_u, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_is_u, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lower_is_u, F.col("dv")).otherwise(F.col("du")).alias("db"),
    )
    o1 = oriented.select("a", F.col("b").alias("b1"), F.col("db").alias("d1"))
    o2 = oriented.select("a", F.col("b").alias("b2"), F.col("db").alias("d2"))
    # merge hints: the oriented edge list is join-derived, so Catalyst
    # size-estimates it from the (tiny) scans and would BROADCAST an
    # edge-sized build side (measured OOM at sf0.1 in a default-heap
    # session); SMJ is safe at any graph size and AQE still downgrades
    # genuinely small sides at runtime
    wedges = o1.join(o2.hint("merge"), "a").where(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("b1") < F.col("b2")))
    )
    closing = oriented.select(
        F.col("a").alias("b1"), F.col("b").alias("b2")
    )
    tri = wedges.join(closing.hint("merge"), ["b1", "b2"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
    totals = (
        e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
        .join(F.broadcast(deg.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum(F.expr("d * (d - 1) div 2")).cast("bigint").alias("n_wedges"),
        )))
    )
    return totals.join(F.broadcast(tri)).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(
            F.col("n_wedges") > 0,
            F.expr("(3 * n_triangles * 1000000) div n_wedges"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("clustering_e6"),
    )


def basket_affinity(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_support: int = 2,
) -> DataFrame:
    """Market-basket pair affinity — support and lift for every item
    pair co-occurring in at least ``min_pair_support`` baskets:

        lift_e6 = n_baskets · n_ab · 1e6 div (n_a · n_b)

    (> 1e6 ⇒ the pair attracts, < 1e6 ⇒ repels). Exact integers
    end-to-end; ties and ordering are deterministic (pairs emitted as
    ``item_a < item_b``).

    Scale: items are deduped per basket FIRST (groupBy basket+item),
    then pairs come from a self-equi-join ON the basket id — per-basket
    fan-out is |basket|², bounded by real basket sizes (an order has
    dozens of lines, not millions); the support prune keeps the output
    to recurring pairs. Item totals are one keyed count; the two
    enrichment joins are on the item key. No all-pairs across baskets
    anywhere.
    """
    if min_pair_support < 1:
        raise ValueError("min_pair_support must be >= 1")
    items = baskets.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    n_baskets = items.agg(
        F.count_distinct("_b").cast("bigint").alias("_nb")
    )
    item_freq = items.groupBy("_i").agg(
        F.count(F.lit(1)).cast("bigint").alias("_f")
    )
    a = items.select(F.col("_b"), F.col("_i").alias("item_a"))
    b = items.select(F.col("_b"), F.col("_i").alias("item_b"))
    pairs = (
        a.join(b, "_b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .where(F.col("n_ab") >= min_pair_support)
    )
    fa = item_freq.select(
        F.col("_i").alias("item_a"), F.col("_f").alias("n_a")
    )
    fb = item_freq.select(
        F.col("_i").alias("item_b"), F.col("_f").alias("n_b")
    )
    return (
        pairs.join(fa, "item_a")
        .join(fb, "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            F.expr(
                "CAST(CAST(_nb AS DECIMAL(38,0)) * n_ab * 1000000"
                " div (n_a * n_b) AS BIGINT)"
            ).alias("lift_e6"),
        )
    )
