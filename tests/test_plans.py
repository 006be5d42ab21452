"""Physical-plan regression tests — the scale claims as assertions.

Each test pins a plan property that matters at 100 TB but is invisible to
row-level correctness tests: predicate pushdown and column pruning reaching
the parquet scan, zero-shuffle signature projection, the CC star path's
bounded exchange count, and the broadcast-only IVF assignment. A refactor
that silently reintroduces a shuffle or defeats pushdown fails here, not in
a production plan review."""

import os

import pyspark.sql.functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TINY", "/root/testdata/sf0.001")


def _initial_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_parquet_filter_pushdown_and_column_pruning(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    q = docs.where(F.col("lang") == "en").select("doc_id", "lang")
    plan = _formatted(q)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan, plan
    # ReadSchema must carry only the projected+filtered columns
    rs = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in rs and "lang" in rs
    assert "text" not in rs and "ts" not in rs, rs


def test_minhash_signature_projection_is_zero_shuffle(spark):
    from ditto_spark.operators.blocking import (
        tokenize, shingle, minhash_signatures,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        F.col("doc_id").alias("conv_id"), F.col("text").alias("entity_text")
    )
    sigs = minhash_signatures(shingle(tokenize(docs), n=2))
    assert _initial_plan(sigs).count("Exchange") == 0


def test_cc_star_path_exchange_budget(spark):
    from ditto_spark.operators.cluster import connected_components

    edges = [
        (f"q{c}_{i}", f"q{c}_{j}")
        for c in range(4)
        for i in range(5)
        for j in range(i + 1, 5)
    ]
    df = spark.createDataFrame(edges, "left_id string, right_id string")
    out = connected_components(df)
    assert connected_components.last_rounds == 0
    # star path: final assembly = groupBy + union + groupBy over checkpointed
    # stars — 3 exchanges, no iterative lineage
    assert _initial_plan(out).count("Exchange") <= 3


def test_ivf_assignment_is_broadcast_only(spark):
    from ditto_spark.operators.ann import ivf_centroids, _ivf_assign, _vec_view

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    vec_col = [c for c in emb.columns if c != "vec_id"][0]
    vecs = _vec_view(emb, "vec_id", vec_col)
    cent = ivf_centroids(emb, n_centroids=4, vec_col=vec_col)
    assigned = _ivf_assign(vecs, cent)
    plan = _initial_plan(assigned)
    # vector side never shuffles: the only exchange under the join is the
    # broadcast of the one-row centroid array
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("Exchange") - plan.count("BroadcastExchange") <= 2, plan


def test_scorer_stage_single_explicit_repartition(spark, tiny_transcripts):
    from ditto_spark.operators.serialize import serialize_conversations
    from ditto_spark.operators.blocking import block_minhash_lsh
    from ditto_spark.operators.scoring import attach_pair_text, score_pairs

    ser = serialize_conversations(tiny_transcripts)
    cand = block_minhash_lsh(ser, text_col="block_text")
    wt = attach_pair_text(cand, ser).repartition(8)
    scored = score_pairs(wt)
    plan = _initial_plan(scored)
    # the plan prints root-first: the segment between the scorer node and
    # its explicit round-robin exchange must contain no OTHER exchange —
    # the Arrow scorer rides the repartition's layout directly
    assert "MapInPandas" in plan and "RoundRobinPartitioning" in plan, plan
    seg = plan.split("MapInPandas", 1)[1].split("RoundRobinPartitioning", 1)[0]
    # the round-robin exchange's own header is the final token before the
    # split point; no additional Exchange may appear in between
    assert seg.count("Exchange") == 1, plan


def test_fs_gamma_plan_single_join_no_python(spark):
    """FS comparison vectors: one block-key equi-join, no cartesian, no
    Python eval nodes — the gamma math stays in codegen."""
    import __spark_entry__ as E

    gam = E.q_fs_comparison_vectors(spark, SF_DIR)
    plan = _initial_plan(gam)
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert plan.count("Exchange") <= 4, plan.count("Exchange")


def test_fs_score_weights_are_literals(spark):
    """fs_score embeds Python-computed log2 weights as CASE literals: the
    plan must contain no runtime LOG over the weight path (only the TF
    adjustment's log2(tf) survives) and no params-table join beyond the
    single TF join."""
    import __spark_entry__ as E

    scored = E.q_fs_match_scores(spark, SF_DIR)
    plan = _initial_plan(scored)
    assert "EvalPython" not in plan
    assert plan.upper().count("LOG") <= 2, plan.upper().count("LOG")


def test_allpairs_prefix_index_excludes_suffix_tokens(spark):
    """AllPairs: the join-side index carries prefix rows only — the plan
    filters on the rank bound before the self-join, and there is no
    cartesian fallback."""
    from ditto_spark.operators.blocking import allpairs_jaccard_join

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    pairs = allpairs_jaccard_join(docs, threshold=0.5, shingle_n=3)
    plan = _initial_plan(pairs)
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_merge_edge_batch_meta_graph_only_iterates_batch(spark):
    """Incremental CC: the corpus-sized assignment appears in exactly the
    two edge-mapping joins and the final remap — the iterative CC input
    is the batch-bounded meta edge set."""
    from ditto_spark.operators.cluster import assign_clusters, merge_edge_batch

    nodes = spark.range(1000).select(F.col("id").alias("conv_id"))
    assign = assign_clusters(
        nodes, spark.createDataFrame([(0, 1)], "left_id long, right_id long")
    ).cache()
    assign.count()
    batch = spark.createDataFrame([(5, 6), (6, 7)], "left_id long, right_id long")
    merged = merge_edge_batch(assign, batch)
    plan = _initial_plan(merged)
    assert "CartesianProduct" not in plan
    assign.unpersist()


def test_bucketed_stage_join_is_exchange_free(spark, tmp_path):
    """Two stages bucketed on the same key join with ZERO Exchange — the
    write-once-shuffle-never-again contract bucketing buys for
    repeatedly-joined stage tables. (Bucket-local sorts may remain when
    a bucket spans multiple files; the shuffle is the 100 TB cost.)"""
    from ditto_spark.checkpoint import write_bucketed

    left = spark.range(0, 5000).select(
        F.col("id").alias("conv_id"), (F.col("id") % 7).alias("x")
    )
    right = spark.range(0, 5000).select(
        F.col("id").alias("conv_id"), (F.col("id") % 11).alias("y")
    )
    lt = write_bucketed(left, "bk_left", str(tmp_path / "bk_left"), "conv_id", 8)
    rt = write_bucketed(right, "bk_right", str(tmp_path / "bk_right"), "conv_id", 8)
    # tiny test tables would broadcast (which also skips the exchange, but
    # proves nothing about bucketing); force the shuffle-join path the way
    # a 100 TB join would take it
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lt.join(rt, "conv_id")
        assert joined.count() == 5000
        plan = _initial_plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")
