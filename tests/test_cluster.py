"""Connected components on known graphs: chains, stars, cycles, singletons
(FIXTURES.md §3 topologies)."""

from ditto_spark.operators.cluster import connected_components, assign_clusters


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "left_id string, right_id string")
    return {
        r["conv_id"]: r["cluster_id"] for r in connected_components(df).collect()
    }


def test_chain(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_long_chain(spark):
    nodes = [f"n{i:02d}" for i in range(12)]
    got = _cc(spark, list(zip(nodes, nodes[1:])))
    assert all(v == "n00" for v in got.values()) and len(got) == 12


def test_star_and_cycle_and_separate(spark):
    edges = [
        ("hub", "s1"), ("hub", "s2"), ("hub", "s3"),      # star
        ("x", "y"), ("y", "z"), ("z", "x"),               # cycle
        ("p", "q"),                                        # pair
    ]
    got = _cc(spark, edges)
    assert got["s1"] == got["s2"] == got["s3"] == got["hub"] == "hub"
    assert got["x"] == got["y"] == got["z"] == "x"
    assert got["p"] == got["q"] == "p"


def test_reversed_and_duplicate_edges(spark):
    got = _cc(spark, [("b", "a"), ("a", "b"), ("b", "c"), ("c", "b")])
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_singletons_assigned_self(spark):
    ids = spark.createDataFrame([("a",), ("b",), ("c",), ("lone",)], "conv_id string")
    pairs = spark.createDataFrame([("a", "b")], "left_id string, right_id string")
    got = {r["conv_id"]: r["cluster_id"] for r in assign_clusters(ids, pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "c", "lone": "lone"}
