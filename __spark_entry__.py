"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship near-duplicate clustering on sf0.001 documents.
queries()       — one entry per implemented operator (SURVEY.md §2 + the
                  training-data-pipeline extensions).
oracle_sql()    — DuckDB-equivalent ANSI SQL per query (omitted for
                  genuinely non-SQL ops: MinHash-LSH banding, the Arrow-UDF
                  scorer, iterative connected components → rows-only checks).

Column names/types are aligned between each Spark query and its oracle
(driver hashes values after sorting columns by name).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ditto_spark.operators import blocking as B  # noqa: E402
from ditto_spark.operators.scoring import (  # noqa: E402
    attach_pair_text,
    score_pairs,
)
from ditto_spark.operators.cluster import assign_clusters  # noqa: E402
from ditto_spark.operators.evaluate import confusion_f1  # noqa: E402

_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it", "on", "for"]


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- helpers

def _doc_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, s) distinct token n-gram shingles (docs are clean
    lowercase+space text, so this matches the SQL string_split oracle)."""
    return (
        B.shingle(B.tokenize(docs, "text"), n=n)
        .where(F.size("tokens") >= n)
        .select("doc_id", F.explode("shingles").alias("s"))
    )


def _rare_shingle_pairs(docs: DataFrame, max_df: int = 50) -> DataFrame:
    """Pairs sharing >=2 rare shingles with exact Jaccard over the
    rare-filtered shingle sets (prefix-filter style pruning)."""
    sh = _doc_shingles(docs)
    rare = (
        sh.groupBy("s").agg(F.count(F.lit(1)).alias("dfc")).where(F.col("dfc") <= max_df)
    )
    # rare-filtered shingles feed the size agg AND both join sides — persist
    f = sh.join(rare.select("s"), "s").persist()
    sizes = f.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    l = f.select(F.col("s"), F.col("doc_id").alias("left_id"))
    r = f.select(F.col("s"), F.col("doc_id").alias("right_id"))
    pairs = (
        l.join(r, "s")
        .where(F.col("left_id") < F.col("right_id"))
        .groupBy("left_id", "right_id")
        .agg(F.count(F.lit(1)).alias("common_shingles"))
        .where(F.col("common_shingles") >= 2)
    )
    return (
        pairs.join(sizes.withColumnsRenamed({"doc_id": "left_id", "n_sh": "na"}), "left_id")
        .join(sizes.withColumnsRenamed({"doc_id": "right_id", "n_sh": "nb"}), "right_id")
        .withColumn(
            "jaccard",
            F.col("common_shingles")
            / (F.col("na") + F.col("nb") - F.col("common_shingles")),
        )
    )


_ORACLE_SHINGLE_CTE = """
WITH sh AS (
  SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       unnest(generate_series(1, greatest(len(l) - 2, 1))) u(i)
  WHERE len(l) >= 3
), rare AS (
  SELECT s FROM sh GROUP BY s HAVING count(*) <= 50
), f AS (
  SELECT sh.doc_id, sh.s FROM sh JOIN rare USING (s)
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM f GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS left_id, b.doc_id AS right_id, count(*) AS common_shingles
  FROM f a JOIN f b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= 2
), jp AS (
  SELECT p.left_id, p.right_id, p.common_shingles,
         p.common_shingles / (sa.n_sh + sb.n_sh - p.common_shingles) AS jaccard
  FROM pairs p
  JOIN sizes sa ON sa.doc_id = p.left_id
  JOIN sizes sb ON sb.doc_id = p.right_id
)
"""


# ---------------------------------------------------------------- queries

def q_serialize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 analogue on the events table: window-ordered COL/VAL entity
    serialization per user (reference matcher.py:52-58 semantics)."""
    ev = _load(spark, sf_dir, "events")
    txt = F.concat(
        F.lit("COL event_type VAL "),
        F.col("event_type"),
        F.lit(" COL value VAL "),
        F.format_string("%.2f", F.col("value")),
    )
    rendered = ev.select(
        "user_id", F.struct(F.col("ts"), F.col("event_id"), txt.alias("txt")).alias("t")
    )
    return rendered.groupBy("user_id").agg(
        F.concat_ws(
            " ", F.transform(F.array_sort(F.collect_list("t")), lambda s: s["txt"])
        ).alias("entity_text"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("dup_count")
    ).select("canonical_id", "dup_count")


def q_shingle_blocking_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load(spark, sf_dir, "documents")
    return _rare_shingle_pairs(docs).select("left_id", "right_id", "common_shingles")


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load(spark, sf_dir, "documents")
    return _rare_shingle_pairs(docs).select(
        "left_id", "right_id", "common_shingles", F.round("jaccard", 9).alias("jaccard")
    )


def q_topk_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 top-k per right row as a ranking window (blocker.py:67-72)."""
    from pyspark.sql import Window

    docs = _load(spark, sf_dir, "documents")
    jp = _rare_shingle_pairs(docs)
    w = Window.partitionBy("right_id").orderBy(F.desc("jaccard"), F.asc("left_id"))
    return (
        jp.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select(
            "left_id", "right_id", F.round("jaccard", 9).alias("jaccard"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


def q_f1_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 confusion-matrix F1 (f1.py:9-19) on a deterministic
    pred/label derivation from the embeddings table."""
    emb = _load(spark, sf_dir, "embeddings")
    df = emb.select(
        (F.col("vec_id") % 3 == 0).cast("int").alias("match"),
        (F.col("label") % 2).alias("label"),
    )
    return confusion_f1(df).select(
        "tp", "fp", "fn", "tn",
        F.round("precision", 9).alias("precision"),
        F.round("recall", 9).alias("recall"),
        F.round("f1", 9).alias("f1"),
    )


def q_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 threshold grid (ditto.py:98-109): strict prob > tau over the
    20-point grid, distributed agg."""
    emb = _load(spark, sf_dir, "embeddings")
    scored = emb.select(
        ((F.col("vec_id") % 100) / 100.0).alias("prob"),
        (F.col("label") % 2).alias("label"),
    )
    from ditto_spark.operators.evaluate import threshold_grid_f1

    g = threshold_grid_f1(scored)
    return g.select(
        F.round("tau", 2).alias("tau"), "tp", "fp", "fn",
        F.round("f1", 9).alias("f1"),
    )


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-quality heuristics: stopword ratio, duplicate-token ratio."""
    docs = _load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        F.round(stop / n, 9).alias("stopword_ratio"),
        F.round((n - nd) / n, 9).alias("dup_token_ratio"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: lexicographic-min md5 over 3-shingles — a
    1-permutation MinHash, portable across engines."""
    docs = _load(spark, sf_dir, "documents")
    return (
        _doc_shingles(docs)
        .groupBy("doc_id")
        .agg(F.min(F.md5(F.col("s"))).alias("fingerprint"))
    )


def q_minhash_md5_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-permutation MinHash where permutation i is md5(i || shingle) and
    the min is lexicographic — engine-portable, so the LSH signature
    construction itself is oracle-checked (the xxhash64 production path in
    ditto_spark.operators.blocking is checked rows-only)."""
    docs = _load(spark, sf_dir, "documents")
    sh = _doc_shingles(docs)
    aggs = [
        F.min(F.md5(F.concat(F.lit(str(i) + "|"), F.col("s")))).alias(f"h{i}")
        for i in range(8)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def q_crowd_majority_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 crowd majority (analyze_gpt.py:68-83): mean label per task > 0.5,
    worker/task/label derived deterministically from events."""
    ev = _load(spark, sf_dir, "events")
    votes = ev.select(
        (F.col("event_id") % 500).alias("task"),
        (F.col("user_id") % 7).alias("worker"),
        (F.col("value") > 100.0).cast("int").alias("label"),
    )
    return votes.groupBy("task").agg(
        (F.avg("label") > 0.5).cast("int").alias("crowd_label"),
        F.count(F.lit(1)).alias("n_votes"),
    )


def q_embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline over the embeddings table
    (query set = vec_id % 25 == 0), JVM-side higher-order functions."""
    emb = _load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    q = emb.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    joined = q.crossJoin(emb).where(F.col("vec_id") != F.col("query_id"))
    cos = (dot(F.col("qv"), F.col("v"))
           / (F.sqrt(dot(F.col("qv"), F.col("qv"))) * F.sqrt(dot(F.col("v"), F.col("v")))))
    from pyspark.sql import Window

    scored = joined.select("query_id", "vec_id", cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            F.round("cos", 6).alias("cos"), F.col("rk").cast("long").alias("rk"),
        )
    )


# ------------------------------------------- non-SQL (rows-only checked)

def q_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production MinHash-LSH candidate generation (xxhash64 banding)."""
    docs = _load(spark, sf_dir, "documents").withColumnRenamed("doc_id", "conv_id")
    out = B.block_minhash_lsh(
        docs.select(F.col("conv_id").cast("string").alias("conv_id"), "text"),
        text_col="text", shingle_n=3, threshold=0.3,
    )
    return out.select(
        "left_id", "right_id", F.round("est_jaccard", 9).alias("est_jaccard")
    )


def q_doc_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dup pipeline on documents: LSH → Arrow-UDF cosine scorer →
    strict p > 0.8 → large-star/small-star CC → clusters."""
    docs = _load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.col("text").alias("entity_text"),
    )
    cands = B.block_minhash_lsh(docs, shingle_n=3, threshold=0.2)
    scored = score_pairs(attach_pair_text(cands, docs))
    matches = scored.where(F.col("prob") > 0.8)
    clusters = assign_clusters(docs, matches.select("left_id", "right_id"))
    return clusters.select(
        F.col("conv_id").alias("doc_id"), F.col("cluster_id")
    )


def q_transcript_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship transcript pipeline on the deterministic synthetic
    corpus (BASELINE.json input_hint shape), scaled by sf."""
    from ditto_spark.synth import generate_transcripts
    from ditto_spark.pipeline import dedup_transcripts

    sf = 0.01
    try:
        sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    except ValueError:
        pass
    n_base = max(int(20000 * sf), 50)
    t = generate_transcripts(spark, n_base=n_base, seed=42, hot_template_frac=0.05)
    return dedup_transcripts(t).clusters


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: near-duplicate document clustering at sf0.001."""
    return q_doc_dedup_clusters(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "serialize_events": q_serialize_events,
        "exact_dedup": q_exact_dedup,
        "shingle_blocking_pairs": q_shingle_blocking_pairs,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "topk_similar": q_topk_similar,
        "f1_confusion": q_f1_confusion,
        "threshold_sweep": q_threshold_sweep,
        "token_stats": q_token_stats,
        "quality_score": q_quality_score,
        "doc_fingerprint": q_doc_fingerprint,
        "minhash_md5_signature": q_minhash_md5_signature,
        "crowd_majority_vote": q_crowd_majority_vote,
        "embedding_cosine_topk": q_embedding_cosine_topk,
        "minhash_lsh_candidates": q_minhash_lsh_candidates,
        "doc_dedup_clusters": q_doc_dedup_clusters,
        "transcript_dedup_clusters": q_transcript_dedup_clusters,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "serialize_events": """
            SELECT user_id,
                   string_agg('COL event_type VAL ' || event_type ||
                              ' COL value VAL ' || printf('%.2f', value),
                              ' ' ORDER BY ts, event_id) AS entity_text,
                   count(*) AS n_events
            FROM events GROUP BY user_id
        """,
        "exact_dedup": """
            SELECT min(doc_id) AS canonical_id, count(*) AS dup_count
            FROM documents GROUP BY text
        """,
        "shingle_blocking_pairs": _ORACLE_SHINGLE_CTE
        + "SELECT left_id, right_id, common_shingles FROM jp",
        "ngram_jaccard_pairs": _ORACLE_SHINGLE_CTE
        + "SELECT left_id, right_id, common_shingles, round(jaccard, 9) AS jaccard FROM jp",
        "topk_similar": _ORACLE_SHINGLE_CTE
        + """
        , ranked AS (
            SELECT left_id, right_id, jaccard,
                   row_number() OVER (PARTITION BY right_id
                                      ORDER BY jaccard DESC, left_id ASC) AS rk
            FROM jp
        )
        SELECT left_id, right_id, round(jaccard, 9) AS jaccard, rk
        FROM ranked WHERE rk <= 5
        """,
        "f1_confusion": """
            WITH d AS (
              SELECT CASE WHEN vec_id % 3 = 0 THEN 1 ELSE 0 END AS match,
                     label % 2 AS label
              FROM embeddings
            ), c AS (
              SELECT sum(CASE WHEN match = 1 AND label = 1 THEN 1 ELSE 0 END)::BIGINT AS tp,
                     sum(CASE WHEN match = 1 AND label = 0 THEN 1 ELSE 0 END)::BIGINT AS fp,
                     sum(CASE WHEN match = 0 AND label = 1 THEN 1 ELSE 0 END)::BIGINT AS fn,
                     sum(CASE WHEN match = 0 AND label = 0 THEN 1 ELSE 0 END)::BIGINT AS tn
              FROM d
            )
            SELECT tp, fp, fn, tn,
                   round(tp / greatest(tp + fp, 1), 9) AS precision,
                   round(tp / greatest(tp + fn, 1), 9) AS recall,
                   round(2.0 * tp / greatest(2 * tp + fp + fn, 1), 9) AS f1
            FROM c
        """,
        "threshold_sweep": """
            WITH scored AS (
              SELECT (vec_id % 100) / 100.0 AS prob, label % 2 AS label
              FROM embeddings
            ), grid AS (
              SELECT i * 0.05 AS tau FROM unnest(generate_series(0, 19)) u(i)
            ), c AS (
              SELECT tau,
                     sum(CASE WHEN prob > tau AND label = 1 THEN 1 ELSE 0 END)::BIGINT AS tp,
                     sum(CASE WHEN prob > tau AND label = 0 THEN 1 ELSE 0 END)::BIGINT AS fp,
                     sum(CASE WHEN prob <= tau AND label = 1 THEN 1 ELSE 0 END)::BIGINT AS fn
              FROM scored CROSS JOIN grid GROUP BY tau
            )
            SELECT round(tau, 2) AS tau, tp, fp, fn,
                   round(2.0 * tp / greatest(2 * tp + fp + fn, 1), 9) AS f1
            FROM c
        """,
        "token_stats": """
            SELECT doc_id,
                   len(string_split(text, ' '))::BIGINT AS n_tokens,
                   len(list_distinct(string_split(text, ' ')))::BIGINT AS n_distinct_tokens,
                   length(text)::BIGINT AS n_chars_actual
            FROM documents
        """,
        "quality_score": f"""
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
            SELECT doc_id,
                   round(len(list_filter(l, x -> list_contains(
                         {_STOPWORDS!r}, x))) / len(l), 9) AS stopword_ratio,
                   round((len(l) - len(list_distinct(l))) / len(l), 9) AS dup_token_ratio
            FROM t
        """,
        "doc_fingerprint": """
            WITH sh AS (
              SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS s
              FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
                   unnest(generate_series(1, greatest(len(l) - 2, 1))) u(i)
              WHERE len(l) >= 3
            )
            SELECT doc_id, min(md5(s)) AS fingerprint FROM sh GROUP BY doc_id
        """,
        "minhash_md5_signature": """
            WITH sh AS (
              SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS s
              FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
                   unnest(generate_series(1, greatest(len(l) - 2, 1))) u(i)
              WHERE len(l) >= 3
            )
            SELECT doc_id,
                   min(md5('0|' || s)) AS h0, min(md5('1|' || s)) AS h1,
                   min(md5('2|' || s)) AS h2, min(md5('3|' || s)) AS h3,
                   min(md5('4|' || s)) AS h4, min(md5('5|' || s)) AS h5,
                   min(md5('6|' || s)) AS h6, min(md5('7|' || s)) AS h7
            FROM sh GROUP BY doc_id
        """,
        "crowd_majority_vote": """
            SELECT event_id % 500 AS task,
                   CASE WHEN avg(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) > 0.5
                        THEN 1 ELSE 0 END AS crowd_label,
                   count(*) AS n_votes
            FROM events GROUP BY event_id % 500
        """,
        "embedding_cosine_topk": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 25 = 0),
            s AS (
              SELECT q.query_id, e.vec_id,
                     list_inner_product(q.qv, e.v) /
                     (sqrt(list_inner_product(q.qv, q.qv)) *
                      sqrt(list_inner_product(e.v, e.v))) AS cos
              FROM q CROSS JOIN e WHERE e.vec_id != q.query_id
            ), ranked AS (
              SELECT query_id, vec_id, cos,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, vec_id ASC) AS rk
              FROM s
            )
            SELECT query_id, vec_id AS neighbor_id, round(cos, 6) AS cos, rk
            FROM ranked WHERE rk <= 5
        """,
    }
