"""Connected components over a pair list — the clustering step that
turns near-duplicate PAIRS into duplicate GROUPS so a pipeline can keep
one canonical document per group (the standard last stage of
MinHash/SimHash dedup in large-corpus training-data preparation).

Algorithm: iterative min-label propagation entirely in DataFrame ops —
each round every node adopts the smallest component id among itself and
its neighbors; a fixpoint means every node carries the minimum id of
its connected component.

Scale design:

* One round = one shuffle join (edges x labels on node id) + one
  aggregation; both are plain hash joins/aggs Catalyst plans freely
  (AQE handles skewed hub nodes).
* Rounds needed = graph diameter. Near-dup graphs are overwhelmingly
  tiny star/clique clusters (diameter 1-2), so this converges in 2-3
  rounds; for adversarial long-chain graphs the alternating
  small-star/large-star variant (Kiveris et al., "Connected Components
  in MapReduce and Beyond") halves distances per round — the loop
  structure here is the same, only the neighbor rule changes.
* ``localCheckpoint`` truncates the growing lineage each round —
  without it the plan doubles per iteration and the driver dies at
  ~20 rounds (on a cluster use ``checkpoint`` with a reliable dir).
* The per-round convergence test is a count() — one job over the
  (small) label table, the standard driver-side loop of iterative
  Spark algorithms (GraphX/GraphFrames do the same).

The reference delegates all consumer-side processing (README.md:30-32);
this operator is part of the north-star LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iters: int = 30
) -> DataFrame:
    """Undirected connected components.

    ``edges``: DataFrame with two node-id columns (long-castable).
    Returns ``(id, comp)`` for every node that appears in an edge,
    where ``comp`` is the minimum node id in the component. Isolated
    nodes (no edges) are absent — callers coalesce to self.
    """
    e = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    # materialize the symmetric edge list ONCE — it is referenced every
    # round, and without truncation each round would re-derive it from
    # its full upstream lineage (for dedup clustering that means
    # re-running MinHash-LSH per iteration)
    # both directions in ONE pass over the caller's pair pipeline (the
    # union form reads it twice — cached or not, that is double work)
    # LAZY checkpoints: round 1's convergence count materializes sym,
    # labels, and the round itself in ONE job (eager forms cost two
    # standalone materialization jobs first — pure scheduling); the
    # stored blocks are reused by every later round either way
    sym = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("a"), F.col("b").alias("b")),
                    F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        sym.select(F.col("a").alias("id")).distinct().withColumn("comp", F.col("id"))
    ).localCheckpoint(eager=False)
    converged = False
    # r15 examined-and-rejected (interleaved same-session A/Bs on
    # lsh_hot_bucket_capped_clusters + dedup_cluster_canonical):
    # (a) batching TWO propagations per convergence check — the inner
    # propagation's labels feed two operators of the outer one, so
    # without a materialization between them (a job, i.e. the very
    # thing the batch saves) the inner subtree computes twice per
    # batch: min/med 3.93/5.00 -> 4.83/5.30 s (hot bucket). (b) a
    # single-reference propagation (self-loop edges + one join+agg,
    # no left-join-back) with and without batching: 4.85/5.53 and
    # 4.72/5.44 — the heavier round-1 setup (the symmetric edge
    # pipeline feeds sym, the node set, AND the self-loop union)
    # costs more than the per-round join it removes. These graphs
    # converge in 2-3 propagations; one checkpointed count per round
    # is the local optimum.
    for _ in range(max_iters):
        neigh = (
            sym.join(labels, sym.b == labels.id)
            .groupBy("a")
            .agg(F.min("comp").alias("ncomp"))
        )
        # carry the changed flag THROUGH the checkpoint and keep the
        # checkpoint lazy: the convergence count below is then the
        # round's ONLY job — it materializes the checkpoint and reads
        # the flag in one pass (eager checkpoint + separate
        # old-vs-new join used to cost 2-3 jobs per round, pure
        # scheduling overhead on the typically tiny label table)
        new_labels = (
            labels.join(neigh, labels.id == neigh.a, "left")
            .select(
                labels.id,
                F.least(F.col("comp"), F.coalesce("ncomp", F.col("comp"))).alias(
                    "ncomp2"
                ),
                F.col("comp").alias("oldcomp"),
            )
            .select(
                "id",
                F.col("ncomp2").alias("comp"),
                (F.col("ncomp2") != F.col("oldcomp")).alias("changed"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.select("id", "comp")
        if changed == 0:
            converged = True
            break
    if not converged:
        # silently returning partial labels would split components —
        # a correctness failure, not a performance one
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(graph diameter exceeds the cap); raise max_iters or use "
            "connected_components_star (O(log^2 n) rounds on any diameter)"
        )
    return labels


def connected_components_star(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iters: int = 50
) -> DataFrame:
    """Undirected connected components via alternating large-star /
    small-star rounds (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14) — same contract as
    ``connected_components`` but converging in O(log^2 n) rounds on
    ADVERSARIAL long-chain graphs where min-label propagation needs
    diameter rounds. Each round roughly halves path lengths:

    * large-star: every node attaches its strictly-larger neighbors to
      the minimum of its closed neighborhood;
    * small-star: on the (hi, lo)-oriented edges, every node attaches
      its smaller neighbors (and itself) to that minimum.

    The fixpoint is a forest of depth-1 stars centered at each
    component's minimum id. Per round: two hash-join + min-agg
    shuffles over the edge list — no driver-side state beyond the
    convergence count, and ``localCheckpoint`` truncates lineage
    exactly as in the propagation variant. Prefer this for graphs with
    unknown/long diameter; near-dup clusters (diameter 1-2) converge
    in the same 2-3 rounds under either.
    """
    e0 = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    # node universe BEFORE dropping self-loops: a node appearing only
    # in a (v, v) edge still "appears in an edge" and must label
    # itself — same contract as connected_components. LAZY checkpoint:
    # it is only read by the final labeling join, so materializing it
    # there (instead of as a standalone job up front) saves one job of
    # scheduling without re-deriving it per round (nothing reads it
    # per round)
    all_nodes = (
        e0.select(F.explode(F.array("a", "b")).alias("id"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    e = e0.filter(F.col("a") != F.col("b"))
    # (hi, lo) orientation is the canonical small-star input. LAZY
    # checkpoint: round 1's convergence count materializes it inside
    # the job it was already running (see connected_components)
    cur = (
        e.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iters):
        # ---- large-star over the full (symmetric) neighborhoods
        sym = cur.unionByName(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = sym.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        large = (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # ---- small-star over the (hi, lo) orientation of large's output
        lo_mins = large.groupBy("a").agg(F.min("b").alias("m"))
        joined = large.join(lo_mins, "a")
        small = (
            joined.select(F.col("b").alias("a"), F.col("m").alias("b"))
            .unionByName(joined.select("a", F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .select(
                F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
            )
            .distinct()
            .localCheckpoint(eager=False)
        )
        # convergence: both sides are DISTINCT sets, so set equality ==
        # empty symmetric difference — ONE job (full-outer join on the
        # edge, count the one-sided rows) instead of the former
        # count() + exceptAll().count() pair per round; the lazy
        # checkpoint of `small` materializes inside this same job
        converged = (
            cur.withColumn("_o", F.lit(1))
            .join(small.withColumn("_n", F.lit(1)), ["a", "b"], "full_outer")
            .filter(F.col("_o").isNull() | F.col("_n").isNull())
            .count()
            == 0
        )
        cur = small
        if converged:
            break
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iters} "
            "rounds; raise max_iters"
        )
    # stars: every remaining edge is (member, center); centers + any
    # node that lost all edges (singleton component) label themselves
    labels = cur.select(F.col("a").alias("id"), F.col("b").alias("comp"))
    return all_nodes.join(labels, "id", "left").select(
        "id", F.coalesce("comp", F.col("id")).alias("comp")
    )


def pagerank_integer(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 1_000_000_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Fixed-iteration PageRank with EXACT integer arithmetic — the
    link-analysis quality signal (domain/page authority) web-corpus
    curation pipelines attach to documents before mixing.

    ``edges`` is a directed (src, dst) list; every node must appear as
    a src (undirected graphs: emit both directions). Rank mass is kept
    in integer "units" (``scale`` per node initially); one iteration is

        r'(v) = floor(scale*(den-num)/den)
                + (num * sum_{u->v} floor(r(u) / outdeg(u))) div den

    — floor division and int64 sums only, so the result is associative,
    order-free, and bit-identical on any engine/cluster layout (float
    PageRank is NOT: the in-sum reorders under shuffle). The floor
    truncation loses < outdeg ulps of mass per node per round — a
    ~1e-9 relative perturbation at the default scale, far below any
    ranking decision threshold, in exchange for exact reproducibility.

    Overflow headroom: a node's in-sum is bounded by total mass
    N*scale; with the default scale int64 overflows near N ~ 1e6 nodes
    ONLY if one node receives nearly all mass — drop ``scale`` to 1e9
    beyond ~1e8 nodes (sum bound 1e17 * damping fits comfortably).

    Scale design: per iteration, ONE join of the rank table against
    the edge list on src (ranks and outdeg are co-keyed by node — at
    cluster scale pre-partition both by node id so the join is
    co-located and only the groupBy(dst) reshuffles), then one
    partially-aggregated sum keyed by dst. This is the Pregel shape;
    iterations are lineage-truncated via lazy localCheckpoint.

    Returns (node, rank) for every node, rank in integer units.
    """
    from bottledwater_pg_spark.session import persist_tracked

    # cache the edge list PRE-PARTITIONED by src: the cached
    # partitioning survives in the InMemoryRelation, so each
    # iteration's join shuffles only the (small) rank table, never
    # the edges — the co-located-join discipline at any scale
    edges = persist_tracked(edges.repartition("src"))
    nodes = persist_tracked(
        edges.select(F.explode(F.array("src", "dst")).alias("node"))
        .distinct()
    )
    outdeg = persist_tracked(edges.groupBy("src").agg(F.count("*").alias("deg")))
    base = scale * (damping_den - damping_num) // damping_den
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    for i in range(iters):
        # pre-divide rank by outdeg on the (small) node side, so the
        # edge list joins ONE node-keyed table per iteration, not two
        rd = ranks.join(outdeg, ranks["node"] == outdeg["src"]).select(
            F.col("node").alias("u"), F.expr("rank div deg").alias("c")
        )
        in_sum = (
            edges.join(rd, edges["src"] == rd["u"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(in_sum, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_num} * coalesce(s, 0L)) div {damping_den}")
            )
            .cast("long")
            .alias("rank"),
        )
        # lineage control: ranks is persisted (keeps AQE's runtime
        # shuffle stats visible, so the edge join broadcast-converts
        # when the node table is small); every ``checkpoint_every``-th
        # round ALSO checkpoint-truncates — unbounded iteration counts
        # must not grow the plan without bound, but a checkpoint hides
        # stats, so it is rationed rather than per-round (the ration
        # is a parameter so the scale ladder can MEASURE the per-round
        # checkpoint cost against the rationed default)
        ranks = persist_tracked(ranks)
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def triangle_counts(pairs: DataFrame, a_col: str = "a",
                    b_col: str = "b") -> DataFrame:
    """Per-node triangle counts over an undirected graph given as
    DISTINCT canonical pairs (``a < b``, one row per edge) — the
    degree-ordered node-iterator algorithm (Schank & Wagner 2005;
    the shape Cohen's MapReduce triangle paper and GraphX's
    TriangleCount use): orient every edge from its lower-(degree, id)
    endpoint to the higher one, enumerate wedges u→v, u→w only from
    each node's OUT-edges, and close each wedge against the oriented
    edge set. Every triangle is counted exactly once, at its
    lowest-ordered vertex.

    Scale: orientation bounds each node's out-degree by O(sqrt(|E|))
    on any graph (a high-degree hub keeps only edges to even
    higher-ordered nodes), so the wedge self-join — the quadratic
    step in the naive algorithm — is quadratic only in the ORIENTED
    out-degree. Three hash joins on ids, one partial-agg count; no
    adjacency list ever materializes per node.

    Returns (node, n_triangles) for every node in at least one
    triangle; pure integers, deterministic."""
    from bottledwater_pg_spark.session import persist_tracked

    # endpoint multiset in ONE pass over the (possibly expensive,
    # possibly unpersisted) pair pipeline — the union-of-two-selects
    # form scans it twice
    deg = (
        pairs.select(
            F.explode(F.array(F.col(a_col), F.col(b_col))).alias("n")
        )
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    # orient by (deg, id): u -> v iff (deg_u, u) < (deg_v, v)
    e = (
        pairs.join(deg.withColumnRenamed("n", a_col), a_col)
        .withColumnRenamed("deg", "dega")
        .join(deg.withColumnRenamed("n", b_col), b_col)
        .withColumnRenamed("deg", "degb")
    )
    oriented = persist_tracked(
        e.select(
            F.when(
                (F.col("dega") < F.col("degb"))
                | (
                    (F.col("dega") == F.col("degb"))
                    & (F.col(a_col) < F.col(b_col))
                ),
                F.struct(
                    F.col(a_col).alias("u"), F.col(b_col).alias("v")
                ),
            )
            .otherwise(
                F.struct(
                    F.col(b_col).alias("u"), F.col(a_col).alias("v")
                )
            )
            .alias("s")
        ).select(F.col("s.u").alias("u"), F.col("s.v").alias("v"))
    )
    # wedges from out-edges only; v < w canonicalizes the wedge so
    # each unordered {v, w} pair closes against ONE oriented edge
    # probe per direction
    w1 = oriented.select("u", F.col("v").alias("x"))
    w2 = oriented.select("u", F.col("v").alias("y"))
    wedges = w1.join(w2, "u").filter(F.col("x") < F.col("y"))
    # the closing edge may be oriented x->y or y->x; probe both
    tri = wedges.join(
        oriented.select(
            F.col("u").alias("x"), F.col("v").alias("y")
        ).unionByName(
            oriented.select(
                F.col("v").alias("x"), F.col("u").alias("y")
            )
        ),
        ["x", "y"],
    )
    # one pass over the wedge-join output — the former three-way
    # union re-ran the join (the operator's dominant cost) per corner
    per_node = (
        tri.select(
            F.explode(
                F.array(F.col("u"), F.col("x"), F.col("y"))
            ).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    return per_node


def kcore_members(pairs: DataFrame, k: int, max_rounds: int = 8,
                  a_col: str = "a", b_col: str = "b") -> DataFrame:
    """K-core decomposition (Seidman 1983; the distributed peeling of
    Montresor et al. 2013): repeatedly remove every node whose degree
    within the surviving subgraph is below ``k`` until fixpoint. The
    k-core is the standard cohesion backbone — community mining,
    graph sampling, and influence analyses all start by discarding
    the low-core periphery. Returns ``(node, core_deg)`` — the
    members with their within-core degree.

    Each peel round is one alive-filtered degree aggregation (two
    semi-joins + partial-agg count; per-round state is the alive set,
    node-sized, persisted). Rounds needed = graph's "degeneracy
    depth", typically small; if ``max_rounds`` passes without
    reaching the fixpoint this RAISES rather than returning a
    non-core (the SQL twin unrolls the same fixed rounds, so a silent
    non-fixpoint would break the oracle contract too). Convergence is
    detected by a 1-row count per round — the same bounded driver
    transfer as connected components' convergence check."""
    from bottledwater_pg_spark.session import persist_tracked

    edges = persist_tracked(pairs.select(a_col, b_col))
    alive = persist_tracked(
        edges.select(
            F.explode(F.array(F.col(a_col), F.col(b_col))).alias("node")
        ).distinct()
    )
    n_alive = alive.count()
    deg = None
    # r15 examined-and-rejected: batching TWO peels per convergence
    # check (halving the per-round job floors) measured consistently
    # SLOWER in an interleaved same-session A/B (supplier_kcore
    # min/med 2.91/3.03 s -> 3.33/3.84 s): the inner peel's alive set
    # feeds BOTH sides of the outer peel's edge filter, and without a
    # materialization between them (which would cost the very job the
    # batch saves) that whole subtree computes twice inside the one
    # job. The per-round checkpoint-then-count below keeps every peel
    # computed exactly once.
    for _ in range(max_rounds):
        ea = edges.join(
            alive.withColumnRenamed("node", a_col), a_col
        ).join(alive.withColumnRenamed("node", b_col), b_col)
        # endpoint multiset in one pass — the union form computed the
        # alive-filtered edge join twice per round
        deg = (
            ea.select(
                F.explode(F.array(F.col(a_col), F.col(b_col))).alias("node")
            )
            .groupBy("node")
            .agg(F.count("*").cast("long").alias("core_deg"))
        )
        # EAGER lineage truncation every round: the alive set feeds
        # BOTH sides of the edge filter, so without truncation the
        # logical plan doubles per round — Catalyst analysis goes
        # exponential in the round count long before any data moves
        # (PageRank only rations its checkpoints because its rank
        # table is referenced once per round — linear growth there).
        # The checkpoint both truncates AND materializes, so no
        # persist wrapper: a cached copy would never be read again
        # and would pin executor memory for the rest of the peel.
        # LAZY + the count below materializes it: one job per round
        # instead of checkpoint-job + count-job (truncation is
        # immediate either way)
        survivors = deg.filter(F.col("core_deg") >= k).localCheckpoint(
            eager=False
        )
        n_next = survivors.count()
        if n_next == n_alive:
            return survivors.select("node", "core_deg")
        alive, n_alive = survivors.select("node"), n_next
        if n_alive == 0:
            return survivors.select("node", "core_deg")
    raise RuntimeError(
        f"k-core peeling did not converge within {max_rounds} rounds "
        f"({n_alive} nodes still alive); raise max_rounds — the SQL "
        "twin must unroll the same number"
    )
