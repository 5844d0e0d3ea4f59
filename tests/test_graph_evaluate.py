"""Semantics pins for the round-4 graph + model-evaluation operators.

Oracle parity runs in test_queries_oracle; these pin what the oracle
can't see: PageRank's fixed-point update against a hand-computed
reference, mass conservation, confusion-metric edge cases
(zero-division), ntile-exact decile splits, and NDCG's ideal-ranking
invariants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators import (
    evaluate,
    graph,
)


# ---------------------------------------------------------------- graph ----


def _star_edges(spark):
    """Hub node h connected to 3 leaves (undirected, both orientations)."""
    rows = []
    for leaf in ("a", "b", "c"):
        rows.append(("h", leaf))
        rows.append((leaf, "h"))
    return spark.createDataFrame(rows, "src string, dst string")


def _reference_pagerank(edges, iterations=3, damping_pct=85):
    """Driver-side mirror of the fixed-point update (pure ints)."""
    from collections import defaultdict

    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    nodes = sorted(deg)
    n = len(nodes)
    init = graph.UNIT // n
    base = (100 - damping_pct) * init // 100
    rank = {v: init for v in nodes}
    for _ in range(iterations):
        s = defaultdict(int)
        for a, b in edges:
            s[b] += rank[a] // deg[a]
        rank = {v: base + damping_pct * s[v] // 100 for v in nodes}
    return rank


def test_pagerank_matches_hand_reference(spark):
    edges_py = [("h", "a"), ("h", "b"), ("h", "c"),
                ("a", "h"), ("b", "h"), ("c", "h")]
    out = {
        r["node"]: r["rank_nano"]
        for r in graph.pagerank(_star_edges(spark), iterations=3).collect()
    }
    assert out == _reference_pagerank(edges_py)
    # hub dominates leaves, leaves are symmetric
    assert out["h"] > out["a"] == out["b"] == out["c"]


def test_pagerank_mass_conserved_up_to_floor_loss(spark):
    out = graph.pagerank(_star_edges(spark), iterations=3).collect()
    total = sum(r["rank_nano"] for r in out)
    # each division floors; loss is bounded by (|V| + |E|) per iteration
    assert graph.UNIT - 10_000 < total <= graph.UNIT


def test_pagerank_uniform_on_regular_graph(spark):
    """On a 3-cycle (regular graph) PageRank is exactly uniform."""
    rows = [("a", "b"), ("b", "c"), ("c", "a")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    out = {r["node"]: r["rank_nano"] for r in graph.pagerank(edges).collect()}
    assert len(set(out.values())) == 1


def test_bipartite_edges_both_orientations(spark):
    """Parts live at 2k (even), suppliers at 2k+1 (odd): part 1 -> 2,
    part 2 -> 4, supplier 10 -> 21. Both orientations, duplicates
    collapsed."""
    li = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 10)], "l_partkey long, l_suppkey long"
    )
    out = {(r["src"], r["dst"]) for r in graph.bipartite_edges(li).collect()}
    assert out == {(2, 21), (21, 2), (4, 21), (21, 4)}


def test_degree_stats(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "a")], "src string, dst string"
    )
    out = {r["node"]: (r["out_degree"], r["in_degree"])
           for r in graph.degree_stats(edges).collect()}
    assert out == {"a": (2, 1), "b": (1, 1), "c": (0, 1)}


# ------------------------------------------------------------- evaluate ----


def test_classifier_eval_counts_and_zero_division(spark):
    rows = [
        # g1: tp=1 fp=1 fn=1 tn=1 -> P=R=F1=500
        ("g1", 1, 1), ("g1", 1, 0), ("g1", 0, 1), ("g1", 0, 0),
        # g2: never predicts positive, one positive label -> P=0 (guard), R=0
        ("g2", 0, 1), ("g2", 0, 0),
    ]
    df = spark.createDataFrame(rows, "g string, pred_pos int, is_pos int")
    out = {r["g"]: r for r in evaluate.classifier_eval(df, group_col="g").collect()}
    g1 = out["g1"]
    assert (g1["tp"], g1["fp"], g1["fn"], g1["tn"]) == (1, 1, 1, 1)
    assert (g1["precision_milli"], g1["recall_milli"], g1["f1_milli"]) == (500, 500, 500)
    g2 = out["g2"]
    assert (g2["precision_milli"], g2["recall_milli"], g2["f1_milli"]) == (0, 0, 0)


def test_classifier_eval_global_row(spark):
    df = spark.createDataFrame([(1, 1), (1, 0)], "pred_pos int, is_pos int")
    out = evaluate.classifier_eval(df).collect()
    assert len(out) == 1
    assert out[0]["precision_milli"] == 500
    assert out[0]["recall_milli"] == 1000


def test_decile_lift_perfect_ranking(spark):
    """20 rows, top-4 scores are exactly the positives -> decile 1-2
    capture all positives with lift = n/pos; tiles are ntile-exact."""
    rows = [(i, 1000 - i, 1 if i < 4 else 0) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, score_milli long, is_pos int")
    out = {r["decile"]: r for r in evaluate.decile_lift(df).collect()}
    assert len(out) == 10
    assert all(out[d]["n_rows"] == 2 for d in out)
    assert out[1]["n_pos"] == 2 and out[2]["n_pos"] == 2
    assert out[2]["capture_milli"] == 1000  # all 4 positives in top 2 tiles
    # lift of tile 2 cumulative: (4/4) / (4/20) = 5.0
    assert out[2]["lift_milli"] == 5000
    assert out[10]["capture_milli"] == 1000 and out[10]["lift_milli"] == 1000


def test_decile_lift_awkward_split(spark):
    """n=13, 10 tiles -> ntile sizes 2,2,2,1,... (first n%t get ceil)."""
    rows = [(i, i, 0) for i in range(13)]
    df = spark.createDataFrame(rows, "doc_id long, score_milli long, is_pos int")
    sizes = {r["decile"]: r["n_rows"] for r in evaluate.decile_lift(df).collect()}
    assert sizes == {1: 2, 2: 2, 3: 2, 4: 1, 5: 1, 6: 1, 7: 1, 8: 1, 9: 1, 10: 1}


def test_ndcg_perfect_and_inverted(spark):
    """If tf-ranking equals relevance ordering, NDCG = 1000; if it is
    anti-correlated with only one relevant doc at the bottom of a
    2-doc list, DCG = rel/log2(3) -> ndcg_milli = 631."""
    rows = [
        (1, "term term term", "en"),   # tf 3, relevant
        (2, "term filler words", "de"),  # tf 1, irrelevant
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["term"]: r for r in evaluate.ndcg_at_k(docs, ["term"], k=10).collect()}
    assert out["term"]["ndcg_milli"] == 1000

    rows_inv = [
        (1, "term", "de"),            # tf 1 -> rank 1, irrelevant
        (2, "term term", "de"),       # tf 2 -> but wait, rank by tf desc
    ]
    # anti-correlated case: relevant doc has the LOWER tf
    rows_inv = [
        (1, "term term", "de"),       # rank 1, rel 0
        (2, "term", "en"),            # rank 2, rel 1
    ]
    docs_inv = spark.createDataFrame(rows_inv, "doc_id long, text string, lang string")
    out = {r["term"]: r for r in evaluate.ndcg_at_k(docs_inv, ["term"], k=10).collect()}
    # dcg = 1/log2(3) = 0.6309 -> 631 milli; idcg = 1/log2(2) = 1000
    assert out["term"]["dcg_milli"] == 631
    assert out["term"]["idcg_milli"] == 1000
    assert out["term"]["ndcg_milli"] == 631


def test_ndcg_skips_docs_without_term(spark):
    rows = [(1, "alpha beta", "en"), (2, "no match here", "en")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = evaluate.ndcg_at_k(docs, ["alpha"], k=10).collect()
    assert len(out) == 1 and out[0]["term"] == "alpha"


def test_triangle_count_hand_graph(spark):
    """K4 minus one edge: nodes a,b,c,d; edges ab,ac,ad,bc,bd (no cd).
    Triangles: abc, abd = 2. Wedges: deg a=3,b=3,c=2,d=2 ->
    3+3+1+1 = 8; clustering = 3*2/8 = 750 milli."""
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d")],
        "a string, b string",
    )
    r = graph.triangle_count(edges).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 5, 2)
    assert r["clustering_milli"] == 750


def test_triangle_count_no_triangles(spark):
    """A path graph has wedges but zero triangles."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "a string, b string"
    )
    r = graph.triangle_count(edges).collect()[0]
    assert r["n_triangles"] == 0 and r["clustering_milli"] == 0


def test_triangle_count_complete_graph(spark):
    """K5: C(5,3)=10 triangles, clustering exactly 1000."""
    nodes = ["a", "b", "c", "d", "e"]
    edges = spark.createDataFrame(
        [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1:]],
        "a string, b string",
    )
    r = graph.triangle_count(edges).collect()[0]
    assert r["n_triangles"] == 10 and r["clustering_milli"] == 1000


def test_cooccurrence_edges_above_mean_rule(spark):
    """Pair (1,2) co-occurs in 3 orders, (1,3) in 1 -> mean pair count
    2; only the strictly-above-mean pair (1,2) becomes an edge."""
    from pyspark.sql import functions as F  # noqa: F811
    rows = [
        (1, 1), (1, 2),
        (2, 1), (2, 2),
        (3, 1), (3, 2),
        (4, 1), (4, 3),
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_suppkey long")
    out = {(r["a"], r["b"]) for r in graph.cooccurrence_edges(li).collect()}
    assert out == {(1, 2)}


def test_bfs_hops_path_graph(spark):
    """Path 1-2-3-4-5 (a<b edges): seed=1; hops 0..3 reach nodes
    1..4, node 5 absent at max_hops=3."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "a long, b long"
    )
    out = {r["node"]: r["hops"] for r in graph.bfs_hops(edges, max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_hops_shortest_wins_over_longer_route(spark):
    """Triangle 1-2-3 plus tail 3-4: node 3 is 1 hop via the direct
    edge even though 1-2-3 offers a 2-hop route."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "a long, b long"
    )
    out = {r["node"]: r["hops"] for r in graph.bfs_hops(edges, max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: 1, 4: 2}


def test_bfs_hops_disconnected_component_absent(spark):
    edges = spark.createDataFrame([(1, 2), (8, 9)], "a long, b long")
    out = {r["node"]: r["hops"] for r in graph.bfs_hops(edges, max_hops=3).collect()}
    assert out == {1: 0, 2: 1}


def test_assortativity_star_is_minus_one(spark):
    """K_{1,n}: hubs only link to leaves -> perfect disassortativity."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.graph import (
        degree_assortativity,
    )

    n = 6
    pairs = [(0, i) for i in range(1, n + 1)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
        "src long, dst long",
    )
    r = degree_assortativity(edges).collect()[0]
    assert r["n_edges"] == 2 * n
    assert r["assortativity"] == -1.0


def test_assortativity_regular_graph_is_null(spark):
    """A cycle is 2-regular: zero degree variance -> NULL, not NaN."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.graph import (
        degree_assortativity,
    )

    n = 8
    ring = [(i, (i + 1) % n) for i in range(n)]
    edges = spark.createDataFrame(
        ring + [(b, a) for a, b in ring], "src long, dst long"
    )
    r = degree_assortativity(edges).collect()[0]
    assert r["assortativity"] is None
