"""Property-based tests (hypothesis) — SURVEY.md §5 test plan.

Each property pits a distributed operator against a trivially-correct
driver-side reference implementation on randomized small inputs.
Settings keep example counts low: every example spins Spark jobs.
"""

import random

from hypothesis import given, settings, strategies as st, HealthCheck
import pyspark.sql.functions as F

from ditto_spark.operators.cluster import connected_components
from ditto_spark.operators.serialize import serialize_conversations
from ditto_spark.operators.blocking import (
    tokenize, shingle, minhash_signatures, estimated_jaccard,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _union_find_components(edges):
    """Driver-side reference: classic union-find with path compression."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {n: find(n) for n in parent}


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1, max_size=40,
    )
)
@settings(**_SETTINGS)
def test_connected_components_matches_union_find(spark, raw_edges):
    edges = [(f"n{a:02d}", f"n{b:02d}") for a, b in raw_edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "left_id string, right_id string")
    want = _union_find_components(edges)
    got = {
        r["conv_id"]: r["cluster_id"] for r in connected_components(df).collect()
    }
    assert got == want
    # loop path (contract=False): AQE coalesces contraction to one
    # partition at this scale, so without this the star loop is untested
    got_loop = {
        r["conv_id"]: r["cluster_id"]
        for r in connected_components(df, contract=False).collect()
    }
    assert got_loop == want


@given(st.randoms(use_true_random=False))
@settings(**_SETTINGS)
def test_serialization_is_row_order_invariant(spark, rnd):
    turns = [
        ("c1", i, "user" if i % 2 == 0 else "assistant", f"text {i}", None)
        for i in range(8)
    ]
    shuffled = turns[:]
    rnd.shuffle(shuffled)
    schema = "conv_id string, turn_idx int, role string, text string, tool string"
    mk = lambda rows: spark.createDataFrame(rows, schema)  # noqa: E731
    a = serialize_conversations(mk(turns)).collect()[0]["entity_text"]
    b = serialize_conversations(mk(shuffled)).collect()[0]["entity_text"]
    assert a == b


@given(st.integers(0, 2**31 - 1))
@settings(**_SETTINGS)
def test_minhash_estimate_tracks_true_jaccard(spark, seed):
    """est_jaccard from 64-perm signatures within 0.25 of the true token-
    shingle Jaccard (binomial bound: 64 perms → σ ≤ 0.0625)."""
    rnd = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    base = [rnd.choice(vocab) for _ in range(40)]
    other = base[:]
    for _ in range(rnd.randint(0, 20)):
        other[rnd.randrange(len(other))] = rnd.choice(vocab)
    df = spark.createDataFrame(
        [("a", " ".join(base)), ("b", " ".join(other))],
        "conv_id string, entity_text string",
    )
    sh = shingle(tokenize(df), n=2)
    sig = minhash_signatures(sh)
    pairs = spark.createDataFrame([("a", "b")], "left_id string, right_id string")
    est = estimated_jaccard(pairs, sig).collect()[0]["est_jaccard"]

    def shingles(toks):
        return {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}

    sa, sb = shingles(base), shingles(other)
    true_j = len(sa & sb) / len(sa | sb)
    assert abs(est - true_j) <= 0.25, (est, true_j)
