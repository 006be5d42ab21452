import numpy as np
import pyspark.sql.functions as F

from ditto_spark.operators.ann import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
    hyperplane_signatures,
)

DIM = 16


def _vecs(spark, n=60, n_clusters=6, seed=3):
    """Clustered unit vectors: cluster centers + small noise."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, DIM)
    rows = []
    for i in range(n):
        c = i % n_clusters
        v = centers[c] + 0.05 * rng.randn(DIM)
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), [
        i % n_clusters for i in range(n)
    ]


def test_bruteforce_topk_finds_same_cluster(spark):
    df, cluster = _vecs(spark)
    v = df.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    q = v.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    out = cosine_topk_bruteforce(v, q, k=3, vec_col="v").collect()
    assert len(out) == 18
    for r in out:
        assert cluster[r["query_id"]] == cluster[r["neighbor_id"]]


def test_lsh_topk_matches_bruteforce_recall(spark):
    df, _ = _vecs(spark)
    v = df.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    q = v.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(v, q, k=3, vec_col="v").collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_lsh(df, dim=DIM, k=3, n_planes=16, bands=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"ANN recall {recall}"


def test_embedding_near_dup_pairs(spark):
    df, cluster = _vecs(spark)
    pairs = embedding_near_dup_pairs(df, dim=DIM, threshold=0.98, bands=8).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert cluster[r["left_id"]] == cluster[r["right_id"]]
        assert r["cos"] >= 0.98


def test_hyperplane_signature_deterministic(spark):
    df, _ = _vecs(spark, n=10)
    a = {r["vec_id"]: r["hsig"] for r in hyperplane_signatures(df, DIM).collect()}
    b = {r["vec_id"]: r["hsig"] for r in hyperplane_signatures(df, DIM).collect()}
    assert a == b
