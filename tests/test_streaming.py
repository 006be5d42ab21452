"""Structured Streaming tests: file source → availableNow trigger → memory
sink, asserting streaming results equal the batch operator on the same data."""

import pyspark.sql.functions as F

from ditto_spark.streaming.incremental import (
    streaming_exact_dedup,
    build_band_index,
    streaming_lsh_candidates,
    fingerprint_expr,
)

SCHEMA = "conv_id string, entity_text string, ts timestamp"


def _write_batches(spark, path):
    rows1 = [
        ("a1", "alpha beta gamma delta", "2025-01-01 10:00:00"),
        ("a2", "Alpha  beta gamma delta", "2025-01-01 10:01:00"),  # dup of a1 (normalized)
        ("b1", "completely different text here", "2025-01-01 10:02:00"),
    ]
    rows2 = [
        ("c1", "alpha beta gamma delta", "2025-01-01 10:03:00"),  # dup again
        ("d1", "yet another fresh document body", "2025-01-01 10:04:00"),
    ]
    df1 = spark.createDataFrame(rows1, SCHEMA.replace("timestamp", "string")).withColumn(
        "ts", F.to_timestamp("ts")
    )
    df2 = spark.createDataFrame(rows2, SCHEMA.replace("timestamp", "string")).withColumn(
        "ts", F.to_timestamp("ts")
    )
    df1.write.mode("append").parquet(path)
    df2.write.mode("append").parquet(path)


def test_streaming_exact_dedup(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batches(spark, src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    deduped = streaming_exact_dedup(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from dedup_sink").collect()
    fps = [r["fingerprint"] for r in got]
    assert len(fps) == len(set(fps))
    # 3 distinct fingerprints among 5 rows
    assert len(got) == 3


def test_streaming_lsh_candidates_match_batch(spark, tmp_path):
    corpus = spark.createDataFrame(
        [
            ("k1", "the quick brown fox jumps over the lazy dog again and again"),
            ("k2", "spark shuffle partitions broadcast join adaptive execution engine"),
        ],
        "conv_id string, entity_text string",
    )
    index = build_band_index(corpus).cache()
    index.count()

    src = str(tmp_path / "src2")
    spark.createDataFrame(
        [
            ("s1", "the quick brown fox jumps over the lazy dog again and again",
             "2025-01-01 10:00:00"),
            ("s2", "totally unrelated payload with nothing in common whatsoever",
             "2025-01-01 10:01:00"),
        ],
        SCHEMA.replace("timestamp", "string"),
    ).withColumn("ts", F.to_timestamp("ts")).write.mode("append").parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    cands = streaming_lsh_candidates(stream, index, threshold=0.5)
    q = (
        cands.writeStream.format("memory")
        .queryName("cand_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {(r["stream_id"], r["corpus_id"]) for r in spark.sql("select * from cand_sink").collect()}
    assert got == {("s1", "k1")}


def test_stateful_sessionize_matches_batch_serializer(spark, tmp_path):
    """applyInPandasWithState sessionizer: conv A's turns arrive in batch 1;
    batch 2 carries much-later events that push the watermark past A's
    session gap → A emits, byte-identical to the batch serializer."""
    from ditto_spark.operators.serialize import serialize_conversations
    from ditto_spark.streaming.incremental import streaming_sessionize_serialize

    schema_str = "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    a_turns = [
        ("A", 1, "assistant", "beta reply", "bash", "2025-01-01 10:00:30"),
        ("A", 0, "user", "alpha question", None, "2025-01-01 10:00:00"),
        ("A", 2, "user", "gamma follow-up", None, "2025-01-01 10:01:00"),
    ]
    late = [("Z", 0, "user", "much later turn", None, "2025-01-01 12:00:00")]

    src = str(tmp_path / "turns")
    mk = lambda rows: (  # noqa: E731
        spark.createDataFrame(rows, schema_str).withColumn("ts", F.to_timestamp("ts"))
    )
    # one file per logical batch + distinct mtimes: multi-part writes with
    # maxFilesPerTrigger=1 process in arbitrary order, and if the late
    # (watermark-advancing) file lands before one of A's part files, A's
    # remaining turns are dropped as late data — an ordering artifact of
    # the test harness, not the operator
    import time as _time

    mk(a_turns).coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.1)
    mk(late).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    out = streaming_sessionize_serialize(stream, watermark="1 minutes", gap_ms=60_000)
    q = (
        out.writeStream.format("memory").queryName("sess_sink")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {r["conv_id"]: r for r in spark.sql("select * from sess_sink").collect()}
    assert "A" in got, f"conversation A not emitted: {got}"
    batch = serialize_conversations(mk(a_turns)).collect()[0]
    assert got["A"]["entity_text"] == batch["entity_text"]
    assert got["A"]["n_turns"] == 3


def test_streaming_window_stats_late_data_dropped(spark, tmp_path):
    from ditto_spark.streaming.incremental import streaming_window_stats

    wschema = "conv_id string, role string, text string, ts string"
    src = str(tmp_path / "winsrc")
    # batch 1: three rows in window [10:00,10:10) (one duplicate text) +
    # a row at 10:40 that advances the watermark to 10:35, closing [10:00,10:10)
    b1 = [
        ("c1", "user", "alpha beta", "2025-01-01 10:01:00"),
        ("c1", "assistant", "reply one", "2025-01-01 10:05:00"),
        ("c2", "user", "alpha beta", "2025-01-01 10:09:00"),  # dup text
        ("c3", "user", "closer row", "2025-01-01 10:40:00"),
    ]
    # batch 2: filler at the frontier — Spark's late-record filter uses the
    # PREVIOUS batch's watermark (eviction uses the current one), so the
    # late row must arrive one batch after the watermark-advancing row to
    # be dropped (measured: a late row landing in the same batch its window
    # is evicted still counts)
    b2 = [("cX", "user", "mid filler", "2025-01-01 10:41:00")]
    # batch 3: a LATE row for the long-closed window (dropped) + a row at
    # 10:55 advancing the watermark to 10:50, closing [10:40,10:50)
    b3 = [
        ("c9", "user", "too late to count", "2025-01-01 10:02:00"),
        ("c4", "user", "final row", "2025-01-01 10:55:00"),
    ]
    # distinct mtimes so maxFilesPerTrigger=1 processes files in batch order
    # (same ordering artifact the sessionize test documents)
    import time as _time

    for i, rows in enumerate([b1, b2, b3]):
        if i:
            _time.sleep(1.1)
        spark.createDataFrame(rows, wschema).withColumn(
            "ts", F.to_timestamp("ts")
        ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(
        "conv_id string, role string, text string, ts timestamp"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    out = streaming_window_stats(stream)
    q = (
        out.writeStream.format("memory").queryName("win_sink")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        (str(r.window_start), r.role): r
        for r in spark.sql("select * from win_sink").collect()
    }
    first_user = got[("2025-01-01 10:00:00", "user")]
    # late row dropped: 2 user turns in the first window, not 3
    assert first_user.n_turns == 2
    assert first_user.n_convs == 2
    assert abs(first_user.dup_rate - 0.5) < 0.05  # 1 distinct text of 2 (HLL)
    assert got[("2025-01-01 10:00:00", "assistant")].n_turns == 1
    # the closed [10:40,10:50) window has the closer + the filler rows
    assert got[("2025-01-01 10:40:00", "user")].n_turns == 2
    # the late row's text never appears in any emitted window
    assert all(r.n_turns <= 2 for r in got.values())


def test_foreachbatch_cluster_maintainer_matches_full_cc(spark, tmp_path):
    """Streamed match edges through make_cluster_maintainer: the persisted
    assignment after the stream drains equals full CC over all edges."""
    from ditto_spark.operators.cluster import assign_clusters
    from ditto_spark.streaming.incremental import make_cluster_maintainer

    edges = [
        ("e1", "e2"), ("e2", "e3"), ("e4", "e5"),
        ("e6", "e7"), ("e3", "e4"),  # merges {e1..e3} with {e4,e5}
        ("e8", "e9"),
    ]
    src = str(tmp_path / "edges_src")
    # three files -> micro-batches (maxFilesPerTrigger=1)
    for i, chunk in enumerate([edges[:2], edges[2:5], edges[5:]]):
        spark.createDataFrame(chunk, "left_id string, right_id string").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{src}/f{i}")

    assignment = str(tmp_path / "assignment")
    stream = (
        spark.readStream.schema("left_id string, right_id string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(make_cluster_maintainer(assignment))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["conv_id"], r["cluster_id"])
        for r in spark.read.parquet(assignment).collect()
    }
    nodes = spark.createDataFrame(
        [(n,) for n in sorted({x for e in edges for x in e})], "conv_id string"
    )
    full = assign_clusters(
        nodes, spark.createDataFrame(edges, "left_id string, right_id string")
    )
    want = {(r["conv_id"], r["cluster_id"]) for r in full.collect()}
    assert got == want


def test_cluster_maintainer_recovers_from_mid_swap_crash(spark, tmp_path):
    """Simulated driver death between the two swap renames: assignment dir
    missing, '._old' holding the prior state. The replayed batch must
    restore and merge, not re-seed from its own edges."""
    import os

    from ditto_spark.streaming.incremental import make_cluster_maintainer

    assignment = str(tmp_path / "assign")
    sink = make_cluster_maintainer(assignment)
    b1 = spark.createDataFrame([("a", "b")], "left_id string, right_id string")
    sink(b1, 0)
    # crash simulation: state renamed away, new state never landed
    os.rename(assignment, assignment + "._old")
    b2 = spark.createDataFrame([("c", "d")], "left_id string, right_id string")
    sink(b2, 1)
    got = {
        (r["conv_id"], r["cluster_id"])
        for r in spark.read.parquet(assignment).collect()
    }
    assert got == {("a", "a"), ("b", "a"), ("c", "c"), ("d", "c")}


def test_hot_key_monitor_state_and_hot_list(spark, tmp_path):
    """CMS counters maintained across micro-batches equal one batch sketch
    over the union; the planted hot key surfaces in the per-batch hot list."""
    from ditto_spark.operators.sketch import cms_counters
    from ditto_spark.streaming.incremental import make_hot_key_monitor

    batches = [
        [("hot",)] * 30 + [(f"a{i}",) for i in range(10)],
        [("hot",)] * 40 + [(f"b{i}",) for i in range(10)],
        [("warm",)] * 25 + [(f"c{i}",) for i in range(10)],
    ]
    src = str(tmp_path / "keys_src")
    for i, chunk in enumerate(batches):
        spark.createDataFrame(chunk, "key string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/f{i}")

    counters = str(tmp_path / "cms_state")
    hot = str(tmp_path / "hot")
    stream = (
        spark.readStream.schema("key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(
            make_hot_key_monitor(counters, "key", d=4, w=512, threshold=50, hot_path=hot)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = sorted(
        map(tuple, spark.read.parquet(counters).select("j", "bucket", "cnt").collect())
    )
    allrows = spark.createDataFrame(
        [r for chunk in batches for r in chunk], "key string"
    )
    want = sorted(map(tuple, cms_counters(allrows, "key", d=4, w=512).collect()))
    assert got == want  # stream state == batch sketch over the union

    hot_keys = {
        r["key"] for r in spark.read.parquet(hot).select("key").collect()
    }
    assert "hot" in hot_keys  # crossed 50 in batch 1 (30+40)
    assert "warm" not in hot_keys  # 25 < 50


def test_hot_key_monitor_replay_is_skipped(spark, tmp_path):
    """A replayed batch id must not double-count into the additive state."""
    from ditto_spark.streaming.incremental import make_hot_key_monitor

    counters = str(tmp_path / "cms_replay")
    apply = make_hot_key_monitor(counters, "key", d=2, w=64, threshold=10**9)
    b0 = spark.createDataFrame([("x",)] * 5, "key string")
    apply(b0, 0)
    once = sorted(map(tuple, spark.read.parquet(counters).collect()))
    apply(b0, 0)  # at-least-once replay of the same batch id
    again = sorted(map(tuple, spark.read.parquet(counters).collect()))
    assert once == again
    b1 = spark.createDataFrame([("x",)] * 3, "key string")
    apply(b1, 1)  # a NEW batch id does accumulate
    final = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in spark.read.parquet(counters).collect()
    }
    assert all(v == 8 for v in final.values())


def test_streaming_lsh_self_candidates_horizon(spark, tmp_path):
    """Stream-stream self-join: in-flight near-dups within the event-time
    horizon pair up exactly once with the right estimate; the same text
    arriving outside the horizon does NOT pair; unrelated texts never
    pair."""
    from ditto_spark.streaming.incremental import (
        streaming_lsh_self_candidates,
    )

    txt = "omega psi chi phi upsilon tau sigma rho pi omicron xi nu"
    other = "completely different words about rivers and boats flowing far"
    rows = [
        ("x1", txt, "2026-01-01 10:00:00"),
        ("x2", txt, "2026-01-01 10:05:00"),   # within 10m of x1 -> pair
        ("y1", txt, "2026-01-01 12:00:00"),   # > horizon from x1/x2
        ("z1", other, "2026-01-01 10:01:00"), # unrelated
    ]
    src = str(tmp_path / "selfjoin_src")
    df = spark.createDataFrame(
        rows, "conv_id string, entity_text string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "conv_id string, entity_text string, ts timestamp"
    ).parquet(src)
    pairs = streaming_lsh_self_candidates(
        stream, horizon="10 minutes", threshold=0.5
    )
    q = (
        pairs.writeStream.format("memory")
        .queryName("self_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from self_sink").collect()
    found = {(r["left_id"], r["right_id"]): r["est_jaccard"] for r in got}
    assert ("x1", "x2") in found, f"got {found}"
    assert found[("x1", "x2")] == 1.0  # identical texts, identical sigs
    for k in found:
        assert k == ("x1", "x2"), f"unexpected pair {k}"
    # exactly once despite 21 band collisions
    assert len(got) == 1
