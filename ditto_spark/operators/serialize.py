"""P1/P2 — entity serialization: transcripts → Ditto-style COL/VAL strings.

Reference semantics: ``to_str`` renders each attribute as
``'COL %s VAL %s ' % (attr, val)`` (/root/reference/matcher.py:52-58) and
skips missing attributes (/root/reference/new_wdc/convert.py:13-14).

Here the entity is a *conversation* and the attributes are its turns in
stable (conv_id, turn_idx) order (BASELINE.json input_hint). Each turn
renders as ``COL role VAL <role> COL text VAL <text> [COL tool VAL <tool>]``
and turns are concatenated with single spaces.

Spark-first design: ONE shuffle — groupBy(conv_id) + collect_list(struct)
+ array_sort + higher-order transform + concat_ws, all whole-stage-codegen
JVM expressions (no Python). A Window.orderBy + collect_list would shuffle
twice; this formulation shuffles once and the sort is per-group in memory.
At 10^12 turns this groupBy is the first of exactly three shuffles in the
whole pipeline (serialize, block-join, cluster), each keyed differently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def render_turn_expr() -> F.Column:
    """COL/VAL rendering of a single turn; tool skipped when null (P2)."""
    base = F.concat(
        F.lit("COL role VAL "), F.col("role"), F.lit(" COL text VAL "), F.col("text")
    )
    return F.when(
        F.col("tool").isNotNull(),
        F.concat(base, F.lit(" COL tool VAL "), F.col("tool")),
    ).otherwise(base)


def serialize_conversations(transcripts: DataFrame) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts)
    → serialized(conv_id, entity_text, n_turns).

    Ordering is made stable by sorting the collected struct array on
    turn_idx (array_sort on struct sorts by fields in order) — the
    per-turn-text-equality invariant the tests assert.
    """
    rendered = transcripts.select(
        "conv_id",
        F.struct(
            F.col("turn_idx"),
            render_turn_expr().alias("turn_text"),
            F.col("text").alias("raw_text"),
        ).alias("t"),
    )
    ordered = F.array_sort(F.collect_list("t"))
    return rendered.groupBy("conv_id").agg(
        F.concat_ws(" ", F.transform(ordered, lambda s: s["turn_text"])).alias(
            "entity_text"
        ),
        # content-only view for blocking: COL/VAL sentinels appear in every
        # turn of every conversation and would dilute shingle similarity
        # (all-pairs baseline Jaccard rises → LSH false candidates at scale)
        F.concat_ws(" ", F.transform(ordered, lambda s: s["raw_text"])).alias(
            "block_text"
        ),
        F.count(F.lit(1)).cast("int").alias("n_turns"),
    )


def collapse_repeated_turns(
    df: DataFrame,
    actor_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("turn_idx",),
    payload_cols: tuple[str, ...] = ("role", "text"),
) -> DataFrame:
    """Drop consecutive repeated turns within an actor's ordered stream —
    the transcript-hygiene pass before serialization: agents stuck in a
    retry loop, duplicated tool outputs, and double-submitted user turns
    otherwise inflate the serialized entity text and skew every downstream
    shingle/MinHash signature. A turn is dropped iff EVERY payload column
    null-safe-equals the previous turn's (SQL IS NOT DISTINCT FROM
    semantics, so null==null collapses too); the first turn of an actor is
    always kept.

    One actor-keyed window shuffle — the same exchange the serializer's
    ordering agg needs, so when composed upstream of it AQE reuses the
    partitioning. Hyperactive-actor skew is inherited from the data (an
    actor's stream is sequential by nature), same caveat as sessions.py.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(actor_col).orderBy(*[F.col(c) for c in order_cols])
    all_equal = None
    for c in payload_cols:
        eq = F.lag(F.col(c)).over(w).eqNullSafe(F.col(c))
        all_equal = eq if all_equal is None else (all_equal & eq)
    rn = F.row_number().over(w)
    return (
        df.withColumn("__rn", rn)
        .withColumn("__dup", all_equal)
        .where((F.col("__rn") == 1) | ~F.col("__dup"))
        .drop("__rn", "__dup")
    )


def conversation_structure_keys(
    transcripts: DataFrame,
    id_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    order_cols: tuple[str, ...] = ("turn_idx",),
) -> DataFrame:
    """Transcript-shape blocking keys — the structural complement of text
    LSH for conversation linkage: two runs of the same agent dialog keep
    their turn structure even when the wording drifts (paraphrase,
    truncation, tool-output noise), so blocking on SHAPE recovers pairs a
    content blocker misses. Per conversation:

        n_turns        turn count
        role_seq_hash  md5 of the '|'-joined role sequence in turn order
        len_bucket     bit-length of total text chars (power-of-2 bucket:
                       integer-exact, no float log)

    ONE groupBy (the serializer's same ordering-in-agg trick: array_sort
    of (order, role, len) structs inside the aggregate — no separate
    window exchange). All expressions engine-portable."""
    t = F.struct(
        *[F.col(c) for c in order_cols],
        F.col(role_col).alias("__role"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("__len"),
    )
    agg = transcripts.groupBy(id_col).agg(
        F.array_sort(F.collect_list(t)).alias("__ts")
    )
    roles = F.concat_ws(
        "|", F.transform(F.col("__ts"), lambda s: s["__role"])
    )
    chars = F.aggregate(
        F.col("__ts"), F.lit(0), lambda acc, s: acc + s["__len"]
    )
    return agg.select(
        F.col(id_col),
        F.size("__ts").alias("n_turns"),
        F.md5(roles).alias("role_seq_hash"),
        F.length(F.conv(chars.cast("string"), 10, 2)).alias("len_bucket"),
    )


def structure_blocking_pairs(
    keys: DataFrame,
    id_col: str = "conv_id",
    join_cols: tuple[str, ...] = ("role_seq_hash", "len_bucket"),
    max_bucket: int = 200,
) -> DataFrame:
    """Equi-join blocking on conversation-structure keys with a
    frequency cut: key groups larger than max_bucket are ubiquitous
    shapes (every 2-turn Q/A conversation shares one) and are dropped
    BEFORE the self-join — the same skew discipline as suffix blocking;
    pair text-LSH candidates with these via unionByName + dropDuplicates.
    Output: (left_id, right_id) distinct, left < right."""
    from pyspark.sql import Window

    w = Window.partitionBy(*join_cols)
    bounded = keys.withColumn("__n", F.count(F.lit(1)).over(w)).where(
        (F.col("__n") > 1) & (F.col("__n") <= max_bucket)
    )
    left = bounded.select(
        *join_cols, F.col(id_col).alias("left_id")
    )
    right = bounded.select(
        *join_cols, F.col(id_col).alias("right_id")
    )
    return (
        left.join(right.hint("shuffle_hash"), list(join_cols))
        .where(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id")
        .distinct()
    )


def turn_alignment_scores(
    pairs: DataFrame,
    transcripts: DataFrame,
    id_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    order_cols: tuple[str, ...] = ("turn_idx",),
) -> DataFrame:
    """Transcript-pair comparator at TURN granularity — the verify step
    matching how conversations actually duplicate: whole turns repeat or
    disappear; characters within a turn rarely drift independently. Two
    measures per candidate pair:

        aligned_frac  fraction of positions whose turn fingerprints agree
                      under strict turn-order alignment (denominator =
                      longer side; a truncated rerun scores len_short/len_long)
        turn_jaccard  order-free overlap of the distinct turn-fingerprint
                      sets — robust to reordering/insertion where strict
                      alignment collapses

    Plan: ONE ordering-in-agg groupBy builds each conversation's ordered
    turn-fingerprint array (md5(role|text) per turn); two id-keyed joins
    attach the arrays to the pair table; both measures are zip_with /
    array_intersect codegen — no Python, no window, per-pair cost bounded
    by its own turn counts."""
    t = F.struct(
        *[F.col(c) for c in order_cols],
        F.md5(
            F.concat_ws(
                "|",
                F.col(role_col),
                F.coalesce(F.col(text_col), F.lit("")),
            )
        ).alias("__fp"),
    )
    fps = transcripts.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(t)), lambda s: s["__fp"]
        ).alias("fps")
    )
    la = fps.select(F.col(id_col).alias("left_id"), F.col("fps").alias("lf"))
    rb = fps.select(F.col(id_col).alias("right_id"), F.col("fps").alias("rf"))
    j = pairs.join(la, "left_id").join(rb, "right_id")
    aligned = F.aggregate(
        F.zip_with("lf", "rf", lambda a, b: (a == b).cast("int")),
        F.lit(0),
        lambda acc, x: acc + F.coalesce(x, F.lit(0)),  # len mismatch → null
    )
    inter = F.size(F.array_intersect(F.array_distinct("lf"), F.array_distinct("rf")))
    union = F.size(F.array_union("lf", "rf"))
    return j.select(
        "left_id",
        "right_id",
        (aligned / F.greatest(F.size("lf"), F.size("rf"))).alias(
            "aligned_frac"
        ),
        (inter / union).alias("turn_jaccard"),
    )
