"""PageRank: float variant vs a pure-Python replay (incl. a dangling
node), integer-exact variant vs the float one on a regular graph, and
the synthetic-graph determinism the gate relies on."""

import pytest

from pyspark.sql import functions as F

from luc4ir_spark.operators import graph as gr


def _py_pagerank(n, edges, n_iter=3, d=0.85):
    """Reference replay: uniform init, dangling mass redistributed."""
    from collections import defaultdict

    out = defaultdict(list)
    for s, t in edges:
        out[s].append(t)
    pr = {v: 1.0 / n for v in range(n)}
    for _ in range(n_iter):
        contrib = defaultdict(float)
        dang = 0.0
        for v, p in pr.items():
            if out[v]:
                share = p / len(out[v])
                for t in out[v]:
                    contrib[t] += share
            else:
                dang += p
        pr = {
            v: (1.0 - d) / n + d * (contrib[v] + dang / n)
            for v in range(n)
        }
    return pr


def test_pagerank_float_vs_python_with_dangling(spark):
    # 0->1, 0->2, 1->2, 2->0, 3 dangling; node 4 isolated sink target
    n = 5
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (1, 4)]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["pr"]
        for r in gr.pagerank(nodes, e, n_iter=3, damping=0.85).collect()
    }
    want = _py_pagerank(n, edges, n_iter=3, d=0.85)
    assert set(got) == set(range(n))
    for v in range(n):
        assert got[v] == pytest.approx(want[v], abs=1e-12), v
    # total mass conserved
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_exact_matches_float_on_regular_graph(spark):
    n = 20
    nodes = spark.createDataFrame(
        [(i,) for i in range(n)], "doc_id long"
    )
    edges = gr.synthetic_link_graph(nodes, n)
    exact = {
        r["id"]: (r["pr_num"], r["pr"])
        for r in gr.pagerank_regular_exact(
            nodes, edges, n, n_iter=3, id_col="doc_id"
        ).collect()
    }
    flt = {
        r["id"]: r["pr"]
        for r in gr.pagerank(
            nodes.select(F.col("doc_id").alias("id")), edges, n_iter=3
        ).collect()
    }
    # numerators: python integer replay of a_{i+1} = 9*60^i + 17*sum
    edge_list = [
        (r["src"], r["dst"]) for r in edges.collect()
    ]
    a = {v: 1 for v in range(n)}
    for i in range(3):
        s = {v: 0 for v in range(n)}
        for u, v in edge_list:
            s[v] += a[u]
        a = {v: 9 * 60**i + 17 * s[v] for v in range(n)}
    for v in range(n):
        assert exact[v][0] == a[v], v
        assert exact[v][1] == pytest.approx(a[v] / (n * 216000.0))
        assert exact[v][1] == pytest.approx(flt[v], rel=1e-12), v
    # scaled numerators sum to the full mass: sum pr = 1
    assert sum(x[0] for x in exact.values()) == n * 216000


def test_hits_hand_computed(spark):
    # star: 0->1, 2->1, 1->0 — hand-unroll two iterations
    n = 3
    edges = [(0, 1), (2, 1), (1, 0)]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: (r["hub_num"], r["auth_num"])
        for r in gr.hits_unnormalized(nodes, e, n_iter=2).collect()
    }
    # python replay
    h = {v: 1 for v in range(n)}
    for _ in range(2):
        a = {v: 0 for v in range(n)}
        for u, v in edges:
            a[v] += h[u]
        h = {v: 0 for v in range(n)}
        for u, v in edges:
            h[u] += a[v]
    # iter1: a = {1:2, 0:1}; h = {0:2, 2:2, 1:1}
    # iter2: a = {1:4, 0:1}; h = {0:4, 2:4, 1:1}
    assert got == {v: (h[v], a[v]) for v in range(n)}
    assert got[1] == (1, 4) and got[0] == (4, 1) and got[2] == (4, 0)


def test_synthetic_graph_is_3_out_regular(spark):
    n = 50
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    e = gr.synthetic_link_graph(nodes, n)
    deg = e.groupBy("src").count().collect()
    assert len(deg) == n and all(r["count"] == 3 for r in deg)
    assert e.filter((F.col("dst") < 0) | (F.col("dst") >= n)).count() == 0


def test_personalized_pagerank_exact(spark):
    n = 20
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = gr.synthetic_link_graph(nodes, n)
    seeds = nodes.filter(F.col("doc_id") % 5 == 0)  # 0,5,10,15
    got = {
        r["id"]: (r["pr_num"], r["pr"])
        for r in gr.pagerank_regular_exact(
            nodes, edges, n, n_iter=3, id_col="doc_id",
            seeds=seeds, n_seeds=4,
        ).collect()
    }
    edge_list = [(r["src"], r["dst"]) for r in edges.collect()]
    a = {v: (1 if v % 5 == 0 else 0) for v in range(n)}
    for i in range(3):
        s = {v: 0 for v in range(n)}
        for u, v in edge_list:
            s[v] += a[u]
        a = {
            v: 9 * 60**i * (1 if v % 5 == 0 else 0) + 17 * s[v]
            for v in range(n)
        }
    for v in range(n):
        assert got[v][0] == a[v], v
        assert got[v][1] == pytest.approx(a[v] / (4 * 216000.0))
    # total mass = |S| * 60^3
    assert sum(x[0] for x in got.values()) == 4 * 216000
    # seeds keep personalized mass concentrated: every seed outranks
    # the global-uniform value only when walks return; just sanity
    assert any(got[v][0] > 0 for v in range(n) if v % 5 != 0)


def test_triangle_count_hand_computed(spark):
    """K4 has 4 triangles; direction, duplicates and self-loops are
    simplified away; a square has none."""
    from luc4ir_spark.operators import graph as gr

    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    k4 += [(0, 0), (1, 2), (1, 2)]  # self-loop + duplicate edges
    e = spark.createDataFrame(k4, "src long, dst long")
    r = gr.triangle_count(e).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)
    square = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    r2 = gr.triangle_count(square).collect()[0]
    assert r2["n_triangles"] == 0 and r2["n_edges"] == 4


def test_anchor_text_field_hand_computed(spark):
    """Two inlinks to doc 5 with overlapping anchor vocab, one to
    doc 6; tf sums across inlinks, n_inlinks counts edges (anchor
    tokens lowercased, split on non-alphanumerics)."""
    edges = spark.createDataFrame(
        [(1, 5, "Click HERE now"), (2, 5, "here: the best page"),
         (3, 6, "best page-Ever")],
        "src long, dst long, anchor string",
    )
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["n_inlinks"])
        for r in gr.anchor_text_field(edges).collect()
    }
    assert got[(5, "here")] == (2, 2)
    assert got[(5, "click")] == (1, 2)
    assert got[(5, "best")] == (1, 2)
    assert got[(6, "best")] == (1, 1)
    assert got[(6, "page")] == (1, 1)
    assert got[(6, "ever")] == (1, 1)
    assert all(d != 1 and d != 2 and d != 3 for d, _ in got)


def test_cocitation_and_coupling_hand_computed(spark):
    """Graph: 1->{a,b}, 2->{a,b}, 3->{a,c} (letters as ids 10,11,12).
    Co-citation: (10,11) cited together by 1 and 2 -> n=2; (10,12) by
    3 only -> n=1 cut at min_count=2. Coupling: (1,2) share {a,b} ->
    n=2; (1,3),(2,3) share {a} -> cut. Parallel edges collapse."""
    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10), (3, 12),
         (1, 10)],  # parallel edge must not double-count
        "src long, dst long",
    )
    cc = {(r["a"], r["b"]): r["n"]
          for r in gr.cocitation_pairs(edges, min_count=2).collect()}
    assert cc == {(10, 11): 2}
    bc = {(r["a"], r["b"]): r["n"]
          for r in gr.coupling_pairs(edges, min_count=2).collect()}
    assert bc == {(1, 2): 2}


def test_coupling_hub_cap_drops_and_logs(spark):
    """A hub target everyone cites is excluded from pairing when its
    in-degree exceeds max_indegree; the drop is logged."""
    edges = spark.createDataFrame(
        [(u, 99) for u in range(5)] + [(1, 7), (2, 7)],
        "src long, dst long",
    )
    msgs = []
    got = {(r["a"], r["b"]): r["n"]
           for r in gr.coupling_pairs(
               edges, min_count=1, max_indegree=3, log=msgs.append
           ).collect()}
    assert got == {(1, 2): 1}   # only the non-hub target pairs
    assert msgs and "dropped 1 hub keys" in msgs[0]


def test_link_prediction_hand_computed(spark):
    """Path graph 0-1-2-3 plus edge 0-2: Γ(0)={1,2}, Γ(1)={0,2},
    Γ(2)={0,1,3}, Γ(3)={2}. Pair (0,1): common={2} -> 1; jaccard =
    1/(2+2-1) = 0.3333; ra = 1/deg(2) = 1/3 -> floor(1e6/3)/1e6 =
    0.3333. Pair (0,2): common={1} -> 1, jaccard = 1/(2+3-1) = 0.25,
    ra = 1/deg(1) = 0.5. Pair (1,2): common={0}, jaccard 0.25,
    ra 0.5. Pair (1,3): common={2}, jaccard = 1/(2+1-1) = 0.5,
    ra = 1/3. Pair (0,3): common={2}, jaccard 0.5, ra 1/3.
    Pair (2,3) shares nothing. min_common=2 drops everything."""
    from luc4ir_spark.operators import graph as gr

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 2)], "src long, dst long"
    )
    got = {
        (r["a"], r["b"]): (r["common"], r["jaccard"], r["ra"])
        for r in gr.link_prediction_pairs(
            edges, min_common=1, max_degree=None
        ).collect()
    }
    assert got == {
        (0, 1): (1, 0.3333, 0.3333),
        (0, 2): (1, 0.25, 0.5),
        (1, 2): (1, 0.25, 0.5),
        (1, 3): (1, 0.5, 0.3333),
        (0, 3): (1, 0.5, 0.3333),
    }
    assert (
        gr.link_prediction_pairs(edges, min_common=2).count() == 0
    )


def test_link_prediction_hub_valve_drops_and_logs(spark):
    """A hub neighbor over max_degree is excluded from pairing (its
    co-membership pairs vanish) but still counts toward the jaccard
    denominators via the UNCAPPED degree table; the drop is logged."""
    from luc4ir_spark.operators import graph as gr

    # star: hub 99 adjacent to 0..4; plus a 2-path 0-7-1
    edges = spark.createDataFrame(
        [(u, 99) for u in range(5)] + [(0, 7), (7, 1)],
        "src long, dst long",
    )
    msgs = []
    got = {
        (r["a"], r["b"]): (r["common"], r["jaccard"])
        for r in gr.link_prediction_pairs(
            edges, min_common=1, max_degree=3, log=msgs.append
        ).collect()
    }
    # the hub is dropped as a SHARED NEIGHBOR (no pair is formed
    # through 99) but still appears as a pair MEMBER: (7, 99) share
    # {0, 1} (both low-degree), jaccard = 2/(2+5-2) with 99's full
    # uncapped degree in the denominator; (0,1) pair through 7 only
    assert got == {(0, 1): (1, 0.3333), (7, 99): (2, 0.4)}
    assert msgs and "dropped 1 hub nodes" in msgs[0]


def test_bfs_depth_hand_computed(spark):
    """Chain 0->1->2->3->4 with a shortcut 0->3: depths 0,1,2,1,2 at
    max_depth=3; node 9 (disconnected) is omitted; min over paths
    wins; depth caps at max_depth."""
    from luc4ir_spark.operators import graph as gr

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3)],
        "src long, dst long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 3, 4, 9)], "id long"
    )
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {
        r["id"]: r["depth"]
        for r in gr.bfs_depth(nodes, edges, seeds, max_depth=3).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2}
    shallow = {
        r["id"]: r["depth"]
        for r in gr.bfs_depth(nodes, edges, seeds, max_depth=1).collect()
    }
    assert shallow == {0: 0, 1: 1, 3: 1}


def test_kcore_peel_hand_computed(spark):
    """K4 plus a pendant chain at k=2: pendant leaf (deg 1) peels in
    round 1; its neighbor (deg 2 -> 1 after) peels in round 2; the K4
    survives (2-core). Direction/duplicates simplify away."""
    from luc4ir_spark.operators import graph as gr

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    chain = [(3, 10), (10, 11)]  # 3-10-11 pendant path
    e = spark.createDataFrame(
        k4 + chain + [(0, 1)], "src long, dst long"
    )
    got = {
        r["id"]: r["peel_round"]
        for r in gr.kcore_peel(e, k=2, rounds=3).collect()
    }
    assert got[11] == 1
    assert got[10] == 2
    assert all(got[v] == 0 for v in range(4))


def test_degree_stats_hand_computed(spark):
    """0->1, 1->0 (mutual), 0->2, 2->2 self-loop (reciprocal by
    convention), duplicate 0->1 collapses: 3 nodes, 4 distinct
    edges, 3 reciprocal (0->1, 1->0, 2->2), reciprocity 0.75."""
    from luc4ir_spark.operators import graph as gr

    e = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 2), (2, 2), (0, 1)],
        "src long, dst long",
    )
    r = gr.degree_stats(e).collect()[0]
    assert (r["n_nodes"], r["n_edges"]) == (3, 4)
    assert r["max_out_degree"] == 2 and r["max_in_degree"] == 2
    assert r["n_reciprocal_edges"] == 3
    assert r["reciprocity"] == 0.75


def test_assortativity_hand_computed(spark):
    """Star K1,3: every edge joins the hub (deg 3) to a leaf (deg 1)
    — maximally disassortative. Symmetric pairs: m=6, Σx=12, Σxy=18,
    Σx²=30 -> r = (6·18−144)/(6·30−144) = −36/36 = −1. A path of two
    edges: r = −0.5 (numpy-replayable). Regular graphs -> NULL."""
    from luc4ir_spark.operators import graph as gr

    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    r = gr.assortativity(star).collect()[0]
    assert (r["n_nodes"], r["n_edges"]) == (4, 3)
    assert r["r_assortativity"] == -1.0
    tri = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    r2 = gr.assortativity(tri).collect()[0]
    assert r2["r_assortativity"] is None  # 2-regular: zero variance
    path = spark.createDataFrame(
        [(0, 1), (1, 2)], "src long, dst long"
    )
    r3 = gr.assortativity(path).collect()[0]
    # pairs: (1,2),(2,1),(2,1),(1,2): m=4, Σx=6, Σxy=8, Σx²=10
    # r = (32-36)/(40-36) = -1.0
    assert r3["r_assortativity"] == -1.0


def test_partition_modularity_hand_computed(spark):
    """Two triangles joined by one bridge edge, communities = the
    triangles: m=7, e_c=3 each, d_c = 7 per community (3+2+2... the
    bridge endpoints have deg 3). Q = (sum 4*m*e - sum d^2)/(4m^2) =
    (4*7*6 - 2*49)/196 = (168-98)/196 = 70/196 ~ 0.3571. A random
    single community gives Q = 0 exactly."""
    from luc4ir_spark.operators import graph as gr

    tri1 = [(0, 1), (1, 2), (2, 0)]
    tri2 = [(3, 4), (4, 5), (5, 3)]
    e = spark.createDataFrame(
        tri1 + tri2 + [(2, 3)], "src long, dst long"
    )
    mem = spark.createDataFrame(
        [(i, "c1" if i < 3 else "c2") for i in range(6)],
        "id long, community string",
    )
    got = {r["community"]: r
           for r in gr.partition_modularity(e, mem).collect()}
    assert got["c1"]["e_intra"] == 3 and got["c2"]["e_intra"] == 3
    assert got["c1"]["d_total"] == 7 and got["c2"]["d_total"] == 7
    assert got["c1"]["q"] == round(70 / 196, 4)
    one = spark.createDataFrame(
        [(i, "all") for i in range(6)], "id long, community string"
    )
    g1 = gr.partition_modularity(e, one).collect()[0]
    assert g1["q"] == 0.0   # (4m*m - (2m)^2)/(4m^2) = 0
