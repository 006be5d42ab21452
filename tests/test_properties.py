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


@settings(**_SETTINGS)
@given(
    seed=st.integers(0, 10_000),
    threshold=st.sampled_from([0.3, 0.42, 0.5, 0.56, 0.6, 0.66, 0.75, 0.8]),
)
def test_allpairs_jaccard_lossless_property(spark, seed, threshold):
    """AllPairs prefix-filter join == brute-force jaccard join for random
    corpora and thresholds (incl. rational-boundary thresholds like 0.56
    where a naive float ceil silently drops pairs)."""
    import itertools

    from ditto_spark.operators.blocking import allpairs_jaccard_join

    rng = random.Random(seed)
    vocab = ["v%02d" % i for i in range(25)]
    docs = []
    for i in range(25):
        toks = rng.sample(vocab, rng.randrange(3, 15))
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["left_id"], r["right_id"])
        for r in allpairs_jaccard_join(df, threshold=threshold).collect()
    }
    sets = {i: set(t.split()) for i, t in docs}
    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(sets), 2)
        if sets[a] & sets[b]
        and len(sets[a] & sets[b]) / len(sets[a] | sets[b]) >= threshold
    }
    assert got == want


@settings(**_SETTINGS)
@given(seed=st.integers(0, 10_000), w=st.sampled_from([2, 3, 4, 6]))
def test_winnow_coverage_and_density_property(spark, seed, w):
    """Winnowing guarantees: every w-window of grams holds >= 1 selected
    fingerprint position, and selection matches the independent Python
    reference for random texts and window sizes."""
    from ditto_spark.operators.blocking import winnow_fingerprints
    from tests.test_blocking import _winnow_py

    rng = random.Random(seed)
    words = ["w%d" % rng.randrange(12) for _ in range(rng.randrange(10, 80))]
    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        (r["fp"], r["fp_pos"])
        for r in winnow_fingerprints(df, k=3, w=w).collect()
    }
    assert got == _winnow_py(text, k=3, w=w)
    n_grams = len(words) - 2
    pos = sorted(p for _, p in got)
    for start in range(0, n_grams - w + 1):
        assert any(start <= p <= start + w - 1 for p in pos)


@given(
    st.lists(  # each conv: a sequence of small-alphabet turn tokens
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=5),
        min_size=2,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_prefix_containment_matches_bruteforce(spark, convs):
    """prefix_containment_pairs == brute-force sequence-prefix comparison.
    Small alphabet + short sequences force frequent prefix collisions."""
    from ditto_spark.operators.serialize import prefix_containment_pairs

    rows = [
        (f"c{ci}", ti, "user", tok, None, None)
        for ci, seq in enumerate(convs)
        for ti, tok in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {
        (r["contained_id"], r["container_id"])
        for r in prefix_containment_pairs(df).collect()
    }
    # brute force: fingerprint = (role, text) per turn
    seqs = {f"c{ci}": [("user", t) for t in seq] for ci, seq in enumerate(convs)}
    want = set()
    for a, sa in seqs.items():
        for b, sb in seqs.items():
            if a == b or len(sa) > len(sb):
                continue
            if sb[: len(sa)] == sa and (len(sa) < len(sb) or a < b):
                want.add((a, b))
    assert got == want
