import pyspark.sql.functions as F

from ditto_spark.operators.simhash import (
    simhash_signatures,
    simhash_near_dup_pairs,
    hamming_distance,
)


def test_simhash_deterministic_and_order_invariant(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "delta gamma beta alpha")],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(df).collect()}
    # token multiset identical → identical signature
    assert sigs[1] == sigs[2]


def test_simhash_near_dup_finds_planted_pairs(spark):
    # SimHash hamming ≤ 3 needs ~99%+ token overlap: one changed token among
    # n flips every bit whose vote margin is ≤ 2, so near-dups here are an
    # exact duplicate (hamming 0) and a large doc with one token appended.
    base = " ".join(f"tok{i:03d}" for i in range(400))
    near = base + " extraword"
    far = "completely different content about spark shuffle partitions and joins"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, far), (4, near)], "doc_id long, text string"
    )
    sig = simhash_signatures(df)
    sigs = {r["doc_id"]: r["simhash"] for r in sig.collect()}
    assert sigs[1] == sigs[2]
    ham_14 = bin(sigs[1] ^ sigs[4]).count("1")
    pairs = simhash_near_dup_pairs(sig, max_hamming=3, bands=4).collect()
    found = {(r["left_id"], r["right_id"]): r["hamming"] for r in pairs}
    assert found[(1, 2)] == 0
    if ham_14 <= 3:
        assert found[(1, 4)] == ham_14
    assert (1, 3) not in found and (2, 3) not in found


def test_hamming_distance(spark):
    df = spark.createDataFrame([(0b1011, 0b0010)], "a long, b long")
    got = df.select(hamming_distance(F.col("a"), F.col("b")).alias("h")).collect()[0]["h"]
    assert got == 2


def test_pigeonhole_guard(spark):
    df = spark.createDataFrame([(1, 0)], "doc_id long, simhash long")
    try:
        simhash_near_dup_pairs(df, max_hamming=4, bands=4)
        assert False, "expected assertion"
    except AssertionError:
        pass
