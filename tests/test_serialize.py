"""Serialization invariants (SURVEY.md §5): per-turn text equality under
stable (conv_id, turn_idx) ordering; null-attr skip; shuffle independence."""

import pyspark.sql.functions as F

from ditto_spark.operators.serialize import serialize_conversations


def test_exact_format_and_ordering(spark):
    rows = [
        ("c1", 1, "assistant", "hi there", "bash", None),
        ("c1", 0, "user", "hello", None, None),
        ("c1", 2, "user", "run it", None, None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    out = serialize_conversations(df).collect()
    assert len(out) == 1
    assert out[0]["entity_text"] == (
        "COL role VAL user COL text VAL hello "
        "COL role VAL assistant COL text VAL hi there COL tool VAL bash "
        "COL role VAL user COL text VAL run it"
    )
    assert out[0]["n_turns"] == 3


def test_shuffle_invariance(spark, tiny_transcripts):
    a = serialize_conversations(tiny_transcripts)
    b = serialize_conversations(tiny_transcripts.repartition(13).sortWithinPartitions(F.desc("turn_idx")))
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert diff == 0


def test_per_turn_equality(spark, tiny_transcripts):
    """Every original turn text must appear verbatim in its entity string,
    and the serialized turn order must equal turn_idx order."""
    ser = serialize_conversations(tiny_transcripts)
    joined = tiny_transcripts.join(ser, "conv_id")
    bad = joined.where(
        ~F.col("entity_text").contains(
            F.concat(F.lit("COL text VAL "), F.col("text"))
        )
    ).count()
    assert bad == 0
    # order: position of each turn's marker is monotone in turn_idx
    pos = joined.select(
        "conv_id",
        "turn_idx",
        F.expr("locate(concat('COL text VAL ', text), entity_text)").alias("pos"),
    )
    w_bad = (
        pos.alias("a")
        .join(pos.alias("b"), "conv_id")
        .where(
            (F.col("a.turn_idx") < F.col("b.turn_idx")) & (F.col("a.pos") >= F.col("b.pos"))
        )
        .count()
    )
    assert w_bad == 0


def test_generator_determinism(spark):
    from ditto_spark.synth import generate_transcripts

    a = generate_transcripts(spark, n_base=30, seed=7, partitions=2)
    b = generate_transcripts(spark, n_base=30, seed=7, partitions=11)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.count() > 0


def test_collapse_repeated_turns(spark):
    from ditto_spark.operators.serialize import collapse_repeated_turns

    rows = [
        # conv A: retry loop (t1 == t2 == t3), then new text, then null pair
        ("A", 0, "user", "hi"),
        ("A", 1, "tool", "out"),
        ("A", 2, "tool", "out"),
        ("A", 3, "tool", "out"),
        ("A", 4, "tool", "out2"),
        ("A", 5, "tool", None),
        ("A", 6, "tool", None),
        # conv B: first turn has null payload — must be kept
        ("B", 0, "user", None),
        ("B", 1, "user", None),
        ("B", 2, "user", "x"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = sorted(
        (r["conv_id"], r["turn_idx"])
        for r in collapse_repeated_turns(df).collect()
    )
    assert got == [("A", 0), ("A", 1), ("A", 4), ("A", 5), ("B", 0), ("B", 2)]


def test_collapse_repeated_turns_partition_invariant(spark):
    from ditto_spark.operators.serialize import collapse_repeated_turns

    df = spark.range(200).select(
        (F.col("id") % 7).cast("string").alias("conv_id"),
        F.col("id").alias("turn_idx"),
        F.lit("r").alias("role"),
        # within a conv ids step by 7, so floor(id/21) repeats ~3 turns in a
        # row — guarantees real consecutive duplicates to collapse
        ((F.col("id") / 21).cast("int") % 5).cast("string").alias("text"),
    )
    a = sorted(r["turn_idx"] for r in collapse_repeated_turns(df).collect())
    b = sorted(
        r["turn_idx"]
        for r in collapse_repeated_turns(df.repartition(13)).collect()
    )
    assert a == b and 0 < len(a) < 200


def test_conversation_structure_keys_and_blocking(spark):
    """Shape keys: same role sequence + same length bucket pair up even
    with different wording; different turn structure does not; ubiquitous
    shapes are frequency-cut; ordering invariance under shuffled input."""
    from ditto_spark.operators.serialize import (
        conversation_structure_keys,
        structure_blocking_pairs,
    )

    def conv(cid, texts_roles):
        return [
            (cid, i, r, t) for i, (r, t) in enumerate(texts_roles)
        ]

    rows = (
        conv("a", [("user", "hello there"), ("assistant", "hi friend")])
        + conv("b", [("user", "howdy pal!!"), ("assistant", "greetings")])
        # same roles as a/b but much longer -> other len bucket
        + conv("c", [("user", "x" * 500), ("assistant", "y" * 500)])
        # different role structure
        + conv("d", [("user", "hello there"), ("user", "hi friend")])
    )
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    keys = conversation_structure_keys(df)
    k = {r["conv_id"]: r for r in keys.collect()}
    assert k["a"]["n_turns"] == 2 and k["a"]["role_seq_hash"] == k["b"]["role_seq_hash"]
    assert k["a"]["role_seq_hash"] == k["c"]["role_seq_hash"]
    assert k["a"]["role_seq_hash"] != k["d"]["role_seq_hash"]
    # chars: a = 11 + 9 = 20 -> bit_length 5; c = 1000 -> 10
    assert k["a"]["len_bucket"] == 5 and k["c"]["len_bucket"] == 10

    pairs = {
        (r["left_id"], r["right_id"])
        for r in structure_blocking_pairs(keys).collect()
    }
    assert pairs == {("a", "b")}

    # frequency cut: 300 identical shapes > max_bucket drop out entirely
    many = [
        (f"m{i}", 0, "user", "zzz") for i in range(300)
    ] + [(f"m{i}", 1, "assistant", "w") for i in range(300)]
    big = spark.createDataFrame(
        many, "conv_id string, turn_idx int, role string, text string"
    )
    cut = structure_blocking_pairs(
        conversation_structure_keys(big), max_bucket=200
    )
    assert cut.count() == 0

    # partition invariance
    k2 = {
        r["conv_id"]: (r["n_turns"], r["role_seq_hash"], r["len_bucket"])
        for r in conversation_structure_keys(df.repartition(7)).collect()
    }
    assert k2 == {
        c: (r["n_turns"], r["role_seq_hash"], r["len_bucket"])
        for c, r in k.items()
    }


def test_turn_alignment_scores_known_values(spark):
    """Hand-computed alignment: identical convs -> (1, 1); truncated rerun
    -> (2/3, 2/3); reordered turns -> aligned 0 yet turn_jaccard 1;
    disjoint -> (0, 0)."""
    from ditto_spark.operators.serialize import turn_alignment_scores

    def conv(cid, turns):
        return [(cid, i, r, t) for i, (r, t) in enumerate(turns)]

    base = [("user", "q1"), ("assistant", "a1"), ("user", "q2")]
    rows = (
        conv("a", base)
        + conv("b", base)                      # identical
        + conv("c", base[:2])                  # truncation
        + conv("d", [base[1], base[0], base[2]])  # reorder
        + conv("e", [("user", "zzz")])         # disjoint
    )
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("a", "e")],
        "left_id string, right_id string",
    )
    got = {
        (r["left_id"], r["right_id"]): (
            round(r["aligned_frac"], 9),
            round(r["turn_jaccard"], 9),
        )
        for r in turn_alignment_scores(pairs, df).collect()
    }
    assert got[("a", "b")] == (1.0, 1.0)
    assert got[("a", "c")] == (round(2 / 3, 9), round(2 / 3, 9))
    assert got[("a", "d")][0] < 1.0 and got[("a", "d")][1] == 1.0
    # reorder: position 2 ('q2' vs 'q2'... d = [a1, q1, q2]) -> only pos 3 aligns
    assert got[("a", "d")][0] == round(1 / 3, 9)
    assert got[("a", "e")] == (0.0, 0.0)


def test_prefix_containment_pairs(spark):
    """Planted containment: B extends A; C equals A; D shares A's first
    turn but diverges at turn 1; E unrelated. Expected pairs:
    (A,B), (C,B) strict prefixes; (A,C) equal-sequence tie (min id left);
    D pairs with nobody (its full 2-turn sequence is not a prefix of
    A/B/C — their turn 1 differs)."""
    from ditto_spark.operators.serialize import prefix_containment_pairs

    turns = {
        "A": [("user", "hello"), ("assistant", "hi")],
        "B": [("user", "hello"), ("assistant", "hi"), ("user", "more")],
        "C": [("user", "hello"), ("assistant", "hi")],
        "D": [("user", "hello"), ("assistant", "different")],
        "E": [("user", "bye"), ("assistant", "later")],
    }
    rows = [
        (cid, i, role, text, None, None)
        for cid, ts in turns.items()
        for i, (role, text) in enumerate(ts)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {
        (r["contained_id"], r["container_id"], r["prefix_len"], r["container_len"])
        for r in prefix_containment_pairs(df).collect()
    }
    assert got == {("A", "B", 2, 3), ("C", "B", 2, 3), ("A", "C", 2, 2)}

    # canonical_only: each contained conv keeps its single longest container
    canon = {
        (r["contained_id"], r["container_id"])
        for r in prefix_containment_pairs(df, canonical_only=True).collect()
    }
    assert canon == {("A", "B"), ("C", "B")}


def test_prefix_containment_partition_invariance(spark):
    """Rolling-hash chains must not depend on physical layout."""
    from ditto_spark.operators.serialize import prefix_containment_pairs
    from ditto_spark.synth import generate_transcripts

    t = generate_transcripts(spark, n_base=40, seed=11)
    a = prefix_containment_pairs(t, max_len=3)
    b = prefix_containment_pairs(
        t.repartition(17).sortWithinPartitions(F.desc("turn_idx")), max_len=3
    )
    assert a.exceptAll(b).count() + b.exceptAll(a).count() == 0
    # max_len=3 truncation makes duplicate groups share equal sequences:
    # the planted dup groups must surface as equal-sequence pairs
    assert a.count() > 0
