"""Link-graph analytics over document collections: distributed
PageRank in the classic Pregel shape (per-iteration edge join +
map-side-combinable aggregation), DataFrame-only — no GraphX, no RDDs.

A web-scale corpus engine needs link analysis next to text analysis
(crawl frontier prioritization, spam-mass estimation, quality priors
for training-data curation). The reference engine has no graph
module; this is part of the large-scale-pipeline surface, same tier
as dedup/quality (see COVERAGE.md).

Scale notes:
- Each iteration is one shuffle-on-src join (edges x ranks), one
  shuffle-on-dst partial+final sum, one shuffle-on-id left join back
  to the node spine. Edges are repartitioned by src ONCE up front and
  localCheckpoint'ed so the (much larger) edge relation never
  re-shuffles across iterations; `checkpoint_every` bounds lineage
  growth for deep iteration counts (lazy plans double per iteration
  otherwise).
- No driver-side loops over data: the only scalar actions are
  node/dangling counts (single aggregates), matching the repo's
  collect policy.

Float parity note (why `pagerank_regular_exact` exists): a float
PageRank sums incoming contributions in engine-specific fold order,
so a DuckDB oracle can disagree in the last ulp and flip a 4dp
rounding boundary. For a k-out-regular graph and rational damping
dn/dd, the scaled numerators a_i defined by

    pr_i(v) = a_i(v) / (n * M^i),   M = dd * k
    a_0(v)  = 1
    a_{i+1}(v) = (dd-dn)*k*M^i + dn * sum_{u->v} a_i(u)

stay INTEGERS, so every sum is fold-order-exact and both engines
produce bit-identical numerators (same trick as classifier_score's
integer md5 weights). The final pr = a_T / (n * M^T) is one division
of identical integers -> identical doubles.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "synthetic_link_graph",
    "pagerank",
    "pagerank_regular_exact",
    "hits_unnormalized",
    "link_prediction_pairs",
    "bfs_depth",
    "degree_stats",
    "assortativity",
    "partition_modularity",
]

# (multiplier, offset) per out-link: dst_j = (id * p_j + q_j) % n.
# Deterministic, engine-portable (pure integer arithmetic), and mixes
# ids enough that in-degrees vary (1..8 at n=500) without hubs.
SYNTH_LINKS = ((7, 11), (13, 5), (3, 1))


def synthetic_link_graph(
    nodes: DataFrame, n: int, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic 3-out-regular link graph over contiguous ids
    0..n-1: doc d links to (d*p_j + q_j) % n for the three (p, q)
    pairs in SYNTH_LINKS. Parallel edges / self-loops are kept as
    generated (both engines see the identical multiset).
    -> (src long, dst long)."""
    parts = [
        nodes.select(
            F.col(id_col).cast("long").alias("src"),
            ((F.col(id_col) * p + q) % n).cast("long").alias("dst"),
        )
        for p, q in SYNTH_LINKS
    ]
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionAll(pdf)
    return out


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    id_col: str = "id",
    checkpoint_every: int = 0,
) -> DataFrame:
    """General float PageRank with uniform dangling-mass
    redistribution: pr_{i+1}(v) = (1-d)/n + d*(sum_{u->v} pr_i(u) /
    outdeg(u) + dangling_i / n), where dangling_i is the total rank
    mass on nodes with no out-edges. -> (id, pr).

    The dangling scalar is folded in as a one-row crossJoin (stays a
    BroadcastNestedLoopJoin of a single row — no driver round-trip
    inside the loop when checkpoint_every=0). Unit-tested against a
    pure-Python replay; the oracle-gated variant is
    pagerank_regular_exact."""
    n = nodes.count()
    spine = nodes.select(F.col(id_col).cast("long").alias("id"))
    outdeg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("double").alias("outdeg")
    )
    # edges carry their source out-degree once; repartition by src so
    # the per-iteration ranks join co-locates without re-shuffling
    # the edge side
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .join(outdeg.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", "outdeg")
        .repartition("src")
        .localCheckpoint(eager=False)
    )
    ranks = spine.withColumn("pr", F.lit(1.0 / n))
    for i in range(n_iter):
        contrib = (
            e.join(ranks, e.src == ranks.id)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("c"))
        )
        dangling = (
            ranks.join(outdeg, "id", "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dang"))
        )
        ranks = (
            spine.join(contrib, spine.id == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("dang") / F.lit(float(n))
                    )
                ).alias("pr"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def hits_unnormalized(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 2,
    id_col: str = "id",
) -> DataFrame:
    """Kleinberg HITS, unnormalized power iterations (the
    normalization in the classic formulation only rescales — rank
    order after k rounds is identical, and skipping it keeps every
    score an INTEGER so the sums are fold-order-exact cross-engine,
    the same parity trick as pagerank_regular_exact):

        h_0 = a_0 = 1
        a_{i+1}(v) = sum over u->v of h_i(u)     (authority from hubs)
        h_{i+1}(u) = sum over u->v of a_{i+1}(v) (hub from NEW auths)

    Nodes with no in-edges get authority 0, no out-edges hub 0.
    Magnitudes grow ~ (avg_in*avg_out)^i — bigint-safe for the small
    iteration counts HITS needs. Per iteration: two shuffle joins +
    two map-side-combinable sums over the edge relation, which is
    repartitioned once by src and localCheckpoint'ed.
    -> (id, hub_num long, auth_num long)."""
    spine = nodes.select(F.col(id_col).cast("long").alias("id"))
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .repartition("src")
        .localCheckpoint(eager=False)
    )
    h = spine.withColumn("h", F.lit(1).cast("long"))
    a = spine.withColumn("a", F.lit(1).cast("long"))
    for _ in range(n_iter):
        a_new = (
            e.join(h.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("h").cast("long").alias("s"))
        )
        a = spine.join(a_new, "id", "left").select(
            "id", F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("a")
        )
        h_new = (
            e.join(a.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("a").cast("long").alias("s"))
        )
        h = spine.join(h_new, "id", "left").select(
            "id", F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("h")
        )
    return (
        h.join(a, "id")
        .select("id", F.col("h").alias("hub_num"), F.col("a").alias("auth_num"))
    )


def pagerank_regular_exact(
    nodes: DataFrame,
    edges: DataFrame,
    n: int,
    n_iter: int = 3,
    out_deg: int = 3,
    damp_num: int = 17,
    damp_den: int = 20,
    id_col: str = "id",
    seeds: DataFrame | None = None,
    n_seeds: int | None = None,
) -> DataFrame:
    """Integer-exact PageRank for a graph where EVERY node has exactly
    ``out_deg`` out-edges (so no dangling mass) and damping is the
    rational damp_num/damp_den. Maintains the scaled integer
    numerators a_i (see module docstring) — every aggregation sums
    integers, so the result is bit-identical across engines and fold
    orders. -> (id, pr_num long — the exact scaled numerator, and
    pr double = pr_num / (N * (damp_den*out_deg)^n_iter), N = n or
    n_seeds).

    ``seeds`` (a one-column DataFrame of ids, with ``n_seeds`` its
    count) switches to PERSONALIZED PageRank — random walk with
    restart: the teleport mass lands only on the seed set, so pr is
    proximity to the seeds (related-docs, topic-sensitive rank,
    Haveliwala 2002). Same recurrence with the restart term gated by
    the seed indicator: a_0(v) = [v in S], a_{i+1}(v) =
    base_i * [v in S] + dn * sum; denominator |S| * M^i — still all
    integers."""
    m = damp_den * out_deg
    spine = nodes.select(F.col(id_col).cast("long").alias("id"))
    if seeds is not None:
        if n_seeds is None:
            raise ValueError("personalized mode needs n_seeds")
        seed_flag = seeds.selectExpr(
            f"cast({seeds.columns[0]} as long) as id", "1L as _seed"
        )
        spine = spine.join(F.broadcast(seed_flag), "id", "left").select(
            "id", F.coalesce(F.col("_seed"), F.lit(0)).alias("_seed")
        )
        pop = n_seeds
    else:
        spine = spine.withColumn("_seed", F.lit(1))
        pop = n
    spine = spine.localCheckpoint(eager=False)
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .repartition("src")
        .localCheckpoint(eager=False)
    )
    a = spine.select("id", F.col("_seed").cast("long").alias("a"))
    for i in range(n_iter):
        contrib = (
            e.join(a, e.src == a.id)
            .groupBy("dst")
            .agg(F.sum("a").cast("long").alias("s"))
        )
        base = (damp_den - damp_num) * out_deg * (m**i)
        a = spine.join(contrib, spine.id == contrib.dst, "left").select(
            "id",
            (
                F.lit(base) * F.col("_seed")
                + F.lit(damp_num) * F.coalesce(F.col("s"), F.lit(0))
            ).cast("long").alias("a"),
        )
    denom = float(pop * (m**n_iter))
    return a.select(
        "id",
        F.col("a").alias("pr_num"),
        (F.col("a") / F.lit(denom)).alias("pr"),
    )


def anchor_text_field(
    edges: DataFrame,
    anchor_col: str = "anchor",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Anchor-text pseudo-field aggregation — the web-IR move Nutch
    feeds Lucene (index each page under the text of its INLINK anchors;
    Craswell, Hawking & Robertson SIGIR'01 showed anchor text beats
    page content for site finding): one row per link with its anchor
    string in, the TARGET page's anchor-field postings out ->
    (doc_id, term, tf, n_inlinks). The result plugs straight into a
    per-field scorer (the ``bm25f_topk`` shape) as an extra field whose
    df/length stats come from this relation.

    Tokenization is the engine's ``simple`` rule (lowercase, split on
    non-alphanumerics). Plan shape: anchors explode per-link (bounded
    by |edges| x anchor length — anchors are a few words by nature,
    never documents), one map-side-combined (dst, term) groupBy, one
    dst-sized inlink count joined dst-keyed. Hot targets (the skew of
    the web) land in COUNTs, combiner-friendly."""
    toks = F.array_remove(
        F.split(F.lower(F.col(anchor_col)), "[^a-z0-9]+"), ""
    )
    flat = edges.select(
        F.col(dst_col).cast("long").alias("doc_id"),
        F.explode(toks).alias("term"),
    )
    tf = flat.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    inl = edges.groupBy(
        F.col(dst_col).cast("long").alias("doc_id")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_inlinks"))
    return tf.join(inl, "doc_id")


def _shared_neighbor_pairs(
    edges: DataFrame,
    key_col: str,
    val_col: str,
    min_count: int,
    max_degree: int | None,
    log=None,
) -> DataFrame:
    """(a, b, n) with a < b and n = #shared ``key_col`` neighbors —
    the engine of co-citation / bibliographic coupling. Parallel edges
    collapse first (a doc citing twice is one citation). The pair
    fan-out is quadratic in per-key degree, so ``max_degree`` is the
    skew valve: keys above it (hub pages, boilerplate link farms) are
    DROPPED from pairing — the standard max_df move — and the drop is
    surfaced through ``log`` so truncation is never silent."""
    e = edges.select(
        F.col(key_col).alias("k"), F.col(val_col).alias("v")
    ).distinct()
    if max_degree is not None:
        deg = e.groupBy("k").agg(F.count(F.lit(1)).alias("_d"))
        keep = deg.filter(F.col("_d") <= int(max_degree)).select("k")
        if log is not None:
            n_drop = deg.filter(F.col("_d") > int(max_degree)).count()
            log(
                f"shared_neighbor_pairs: dropped {n_drop} hub keys "
                f"over degree {max_degree}"
            )
        e = e.join(keep, "k")
    l, r = e.alias("l"), e.alias("r")
    pairs = l.join(
        r,
        (F.col("l.k") == F.col("r.k")) & (F.col("l.v") < F.col("r.v")),
    )
    return (
        pairs.groupBy(
            F.col("l.v").alias("a"), F.col("r.v").alias("b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= int(min_count))
    )


def cocitation_pairs(
    edges: DataFrame,
    min_count: int = 2,
    max_indegree: int | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
    log=None,
) -> DataFrame:
    """Co-citation strength (Small, JASIS 1973): n(a, b) = #documents
    citing BOTH a and b — the classic relatedness signal between CITED
    pages. Pairing key = the citing doc (out-degree-bounded, so a
    crawl's bounded outlink count bounds the fan-out); ``max_indegree``
    is unused here and accepted only for symmetry — the valve that
    matters is on ``coupling_pairs``."""
    return _shared_neighbor_pairs(
        edges, src_col, dst_col, min_count, None, log
    )


def coupling_pairs(
    edges: DataFrame,
    min_count: int = 2,
    max_indegree: int | None = 100_000,
    src_col: str = "src",
    dst_col: str = "dst",
    log=None,
) -> DataFrame:
    """Bibliographic coupling (Kessler, American Documentation 1963):
    n(a, b) = #targets cited by BOTH a and b — relatedness between
    CITING pages. Pairing key = the cited target, whose in-degree is
    the web's heavy tail — ``max_indegree`` drops hub targets from
    pairing (a page everyone links to carries no coupling signal
    anyway, exactly the stopword/max_df argument)."""
    return _shared_neighbor_pairs(
        edges, dst_col, src_col, min_count, max_indegree, log
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Distributed triangle counting — the ordered-edge (a < b < c)
    join, i.e. the classic MapReduce/Spark triangle algorithm (Suri &
    Vassilvitskii WWW'11's node-iterator++ without the degree
    re-ordering): the directed multigraph is first undirected and
    simplified (least/greatest, self-loops dropped, duplicates
    collapsed), then each triangle is counted exactly once via

        e1(a, b) JOIN e2(b, c) JOIN e3(a, c)   with a < b < c.

    -> one row (n_nodes, n_edges, n_triangles) — all-integer.

    Scale: two shuffles on edge endpoints; the known weakness is a
    high-degree hub making the e1-e2 join quadratic in its degree —
    production-grade compact-forward orders endpoints by DEGREE before
    the a<b<c cut so hubs land on the small side; at 100 TB swap the
    id ordering for (degree, id) ordering (one extra degree join),
    same plan otherwise."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    und = und.localCheckpoint(eager=False)
    e2 = und.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = und.select(F.col("a"), F.col("b").alias("c"))
    tri = (
        und.join(e2, "b")
        .join(e3, ["a", "c"], "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    nodes = (
        edges.select(F.col("src").alias("x"))
        .unionAll(edges.select(F.col("dst").alias("x")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
    ne = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return nodes.crossJoin(ne).crossJoin(tri).select(
        "n_nodes", "n_edges", "n_triangles"
    )


def link_prediction_pairs(
    edges: DataFrame,
    min_common: int = 2,
    max_degree: int | None = 100_000,
    scale: int = 1_000_000,
    log=None,
) -> DataFrame:
    """Neighborhood link-prediction scores (Liben-Nowell & Kleinberg
    CIKM'03) over the undirected simple graph: for every node pair
    (a < b) sharing >= ``min_common`` neighbors,

      common  = |Γ(a) ∩ Γ(b)|                 (common neighbors)
      jaccard = common / |Γ(a) ∪ Γ(b)|
      ra      = Σ_{z ∈ Γ(a)∩Γ(b)} 1/deg(z)    (resource allocation,
                                               Zhou/Lü/Zhang EPJ B'09)

    RA is the degree-weighted cousin of Adamic-Adar (1/deg instead of
    1/ln deg) — chosen here because it admits EXACT fixed-point
    arithmetic: each 1/deg(z) is quantized to the integer
    floor(scale/deg(z)) (integer division on both engines — no
    cross-engine ln()/fold-order hazard), summed exactly as BIGINTs,
    with ONE final division by ``scale``. Jaccard is likewise one
    division of exact integers (|∪| = deg(a)+deg(b)−common on a simple
    graph). -> (a, b, common, jaccard, ra), 4dp, engine-stable.

    Scale shape: the directed multigraph simplifies once
    (least/greatest + distinct, self-loops dropped); pairing fans out
    quadratically in shared-neighbor degree, so ``max_degree`` is the
    standard hub valve (the coupling_pairs/max_df move) — nodes above
    it are dropped FROM PAIRING ONLY and the drop is surfaced through
    ``log``, never silent. One shuffle keys the self-join on the
    shared neighbor; degree joins are degree-table-sized (node count,
    not edge count) and AQE-broadcastable."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    nbr = und.select(
        F.col("a").alias("z"), F.col("b").alias("v")
    ).unionAll(und.select(F.col("b").alias("z"), F.col("a").alias("v")))
    deg = nbr.groupBy("z").agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    pair_deg = deg
    if max_degree is not None:
        if log is not None:
            n_drop = deg.filter(F.col("d") > int(max_degree)).count()
            log(
                f"link_prediction_pairs: dropped {n_drop} hub nodes "
                f"over degree {max_degree} from pairing"
            )
        pair_deg = deg.filter(F.col("d") <= int(max_degree))
    nz = nbr.join(pair_deg, "z").select(
        "z", "v", F.expr(f"div({int(scale)}, d)").alias("w")
    )
    nz = nz.repartition("z").localCheckpoint(eager=False)
    # ^ consumed by both sides of the self-join; localCheckpoint keeps
    # the shared scan from recomputing per side (the repo's HOF-free
    # variant of the LSH fan-out fix — cheap insurance here)
    pairs = (
        nz.alias("l")
        .join(
            nz.alias("r"),
            (F.col("l.z") == F.col("r.z"))
            & (F.col("l.v") < F.col("r.v")),
        )
        .groupBy(F.col("l.v").alias("a"), F.col("r.v").alias("b"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("common"),
            F.sum("l.w").cast("long").alias("_ra_q"),
        )
        .filter(F.col("common") >= int(min_common))
    )
    da = deg.select(F.col("z").alias("a"), F.col("d").alias("_da"))
    db = deg.select(F.col("z").alias("b"), F.col("d").alias("_db"))
    return (
        pairs.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "common",
            F.round(
                F.col("common")
                * 1.0
                / (F.col("_da") + F.col("_db") - F.col("common")),
                4,
            ).alias("jaccard"),
            F.round(F.col("_ra_q") / float(scale), 4).alias("ra"),
        )
    )


def bfs_depth(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 3,
    id_col: str = "id",
) -> DataFrame:
    """Bounded-depth BFS from a seed set — the crawl-depth / seed-
    distance assignment of frontier management (a page's link distance
    from the seed list is the classic crawl-priority and spam-distance
    signal, e.g. TrustRank's seed proximity): min link distance from
    ANY seed, up to ``max_depth`` hops; unreached nodes are omitted.
    -> (id, depth), depth in [0, max_depth].

    Plan shape: ``max_depth`` rounds of (frontier ⋈ edges on src) —
    the standard relational BFS; each round's frontier is min-depth
    deduped BEFORE the next join so a node never re-expands (the
    frontier can only shrink relative to reachable set). Depth counts
    are bounded by the unroll constant, so the lazy plan stays linear;
    for deep BFS at 100 TB switch to the pagerank-style
    localCheckpoint-per-iteration loop — same join shape."""
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    cur = seeds.select(
        F.col(id_col).cast("long").alias("id")
    ).distinct().withColumn("depth", F.lit(0).cast("long"))
    best = cur
    for d in range(1, int(max_depth) + 1):
        nxt = (
            cur.join(e, cur["id"] == e["src"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .withColumn("depth", F.lit(d).cast("long"))
        )
        best = (
            best.unionByName(nxt)
            .groupBy("id")
            .agg(F.min("depth").cast("long").alias("depth"))
        )
        cur = best.filter(F.col("depth") == d)
    return best


def kcore_peel(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 3,
) -> DataFrame:
    """Bounded k-core peeling (Seidman, Social Networks 1983; the
    degeneracy decomposition behind spam-farm and community-core
    detection — link spam clusters survive high-k cores, organic
    pages don't): repeatedly delete nodes of degree < k from the
    undirected simple graph, ``rounds`` times. The true k-core is the
    fixpoint; a bounded unroll reports which round each node fell
    (early rounds = peripheral, survivors = core-like) — and in
    practice most mass settles in the first few peels.
    -> (id, peel_round): 1-based round the node was removed, 0 for
    nodes still standing after ``rounds``.

    Plan shape: per round one degree aggregate + two semi-joins to
    restrict the edge set — the standard relational peel; the unroll
    constant bounds plan depth (the docstring rule of `bfs_depth`:
    deep fixpoints switch to a localCheckpoint loop, same shape)."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .distinct()
    )
    cur_edges = und
    alive = nodes
    out = None
    for r in range(1, int(rounds) + 1):
        deg = (
            cur_edges.select(F.col("a").alias("id"))
            .unionAll(cur_edges.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).cast("long").alias("_d"))
        )
        survivors = (
            alive.join(deg, "id", "left")
            .filter(F.coalesce(F.col("_d"), F.lit(0)) >= int(k))
            .select("id")
            .localCheckpoint(eager=False)
        )
        removed = alive.join(survivors, "id", "left_anti").select(
            "id", F.lit(r).cast("long").alias("peel_round")
        )
        out = removed if out is None else out.unionByName(removed)
        alive = survivors
        cur_edges = (
            cur_edges.join(
                survivors.withColumnRenamed("id", "a"), "a", "left_semi"
            ).join(
                survivors.withColumnRenamed("id", "b"), "b", "left_semi"
            )
        )
    core = alive.select("id", F.lit(0).cast("long").alias("peel_round"))
    return out.unionByName(core)


def degree_stats(edges: DataFrame) -> DataFrame:
    """One-row link-graph health summary — the numbers a crawl/graph
    pipeline dashboards before anything heavier runs: node/edge
    counts, max in/out degree (the hub alarm that decides the
    `max_degree`/`max_indegree` valves everywhere else), and
    RECIPROCITY — the fraction of directed edges whose reverse also
    exists (Newman et al., PRE 2002) — high on social graphs, low on
    the web; a sudden shift flags crawl scope drift.
    -> (n_nodes, n_edges, max_out_degree, max_in_degree,
    n_reciprocal_edges, reciprocity) — integers + ONE division.

    Plan shape: distinct edge set once (localCheckpoint'ed — feeds
    three aggregates and a self-join), two degree aggregates, and the
    reciprocity self-join on the reversed key. Self-loops count as
    reciprocal by convention (their reverse is themselves)."""
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("x"))
        .unionAll(e.select(F.col("dst").alias("x")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
    deg = e.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
    )
    outd = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("_d"))
        .agg(F.max("_d").cast("long").alias("max_out_degree"))
    )
    ind = (
        e.groupBy("dst")
        .agg(F.count(F.lit(1)).alias("_d"))
        .agg(F.max("_d").cast("long").alias("max_in_degree"))
    )
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    recip = e.join(rev, ["src", "dst"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_reciprocal_edges")
    )
    return (
        nodes.crossJoin(deg)
        .crossJoin(outd)
        .crossJoin(ind)
        .crossJoin(recip)
        .select(
            "n_nodes",
            "n_edges",
            "max_out_degree",
            "max_in_degree",
            "n_reciprocal_edges",
            F.round(
                F.col("n_reciprocal_edges") / F.col("n_edges"), 4
            ).alias("reciprocity"),
        )
    )


def assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman, PRL 2002) — do
    high-degree nodes link to other high-degree nodes (social-network
    positive) or to leaves (web/internet negative)? The Pearson
    correlation of degrees at the two ends of every undirected edge,
    with each edge contributing BOTH orientations (the symmetric
    convention, making Σx = Σy):

        r = (mΣxy − ΣxΣy) / (mΣx² − (Σx)²)

    over the m = 2·|edges| orientation pairs — for symmetric input
    the two normalizing factors coincide, so the whole statistic is
    INTEGER sums with ONE division (no sqrt at all), engine-exact.
    NULL when the graph is degree-regular (zero variance).
    -> ONE row (n_nodes, n_edges, r_assortativity).

    Plan shape: undirected simplify once, one degree aggregate joined
    to both edge endpoints (degree table is node-sized, AQE
    broadcasts), one global aggregate of integer products."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("d").alias("_da"))
    db = deg.select(F.col("id").alias("b"), F.col("d").alias("_db"))
    e = und.join(da, "a").join(db, "b")
    both = e.select(
        F.col("_da").alias("x"), F.col("_db").alias("y")
    ).unionAll(
        e.select(F.col("_db").alias("x"), F.col("_da").alias("y"))
    )
    agg = both.agg(
        F.count(F.lit(1)).cast("long").alias("_m"),
        F.sum("x").cast("long").alias("_sx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("_sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("_sxx"),
    )
    nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    ne = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    num = F.col("_m") * F.col("_sxy") - F.col("_sx") * F.col("_sx")
    den = F.col("_m") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    return (
        nodes.crossJoin(ne)
        .crossJoin(agg)
        .select(
            "n_nodes",
            "n_edges",
            F.when(den != 0, F.round(num / den, 4)).alias(
                "r_assortativity"
            ),
        )
    )


def partition_modularity(
    edges: DataFrame,
    membership: DataFrame,
    id_col: str = "id",
    community_col: str = "community",
) -> DataFrame:
    """Modularity Q of a GIVEN partition (Newman & Girvan, PRE 2004)
    — the quality score of any community assignment (connected
    components, source/host grouping, an external clustering):

        Q = Σ_c [ e_c/m − (d_c/(2m))² ]
          = (Σ_c 4·m·e_c − Σ_c d_c²) / (4m²)

    with m undirected edges, e_c intra-community edges and d_c the
    community's degree sum — the second form is an INTEGER numerator
    with ONE division, engine-exact. Q ≈ 0: no more intra-community
    structure than chance; Q > 0.3: classic community signal.
    -> one row per community (community, n_nodes, e_intra, d_total,
    q) with the global q repeated (the repo's one-statistic
    convention); unassigned nodes raise — membership must cover the
    graph (coalesce upstream).

    Plan shape: undirected simplify once; TWO membership joins onto
    the edge endpoints (node-sized dim, AQE broadcasts); community-
    cardinality-sized aggregates after."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    mem = membership.select(
        F.col(id_col).alias("_id"), F.col(community_col).alias("_c")
    )
    e = (
        und.join(mem.withColumnRenamed("_id", "a"), "a")
        .withColumnRenamed("_c", "_ca")
        .join(mem.withColumnRenamed("_id", "b"), "b")
        .withColumnRenamed("_c", "_cb")
    )
    m_tot = und.agg(F.count(F.lit(1)).cast("long").alias("_m"))
    intra = (
        e.filter(F.col("_ca") == F.col("_cb"))
        .groupBy(F.col("_ca").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_intra"))
    )
    deg = (
        e.select(F.col("a").alias("_id"), F.col("_ca").alias("community"))
        .unionAll(
            e.select(F.col("b").alias("_id"), F.col("_cb").alias("community"))
        )
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).cast("long").alias("d_total"),
            F.count_distinct("_id").cast("long").alias("n_nodes"),
        )
    )
    per = deg.join(intra, "community", "left").select(
        "community",
        "n_nodes",
        F.coalesce("e_intra", F.lit(0)).cast("long").alias("e_intra"),
        "d_total",
    )
    tot = per.crossJoin(F.broadcast(m_tot)).agg(
        F.sum(F.lit(4) * F.col("_m") * F.col("e_intra"))
        .cast("long")
        .alias("_num_e"),
        F.sum(F.col("d_total") * F.col("d_total")).cast("long").alias(
            "_num_d"
        ),
        F.max("_m").alias("_m2"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "community",
        "n_nodes",
        "e_intra",
        "d_total",
        F.round(
            (F.col("_num_e") - F.col("_num_d"))
            / (F.lit(4) * F.col("_m2") * F.col("_m2")),
            4,
        ).alias("q"),
    )
