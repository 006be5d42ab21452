"""S1-S6, S11 — sources/sinks matching the reference's file formats.

The reference moves data as loose TSV/JSONL/CSV files; these readers/writers
re-express each one as a Spark reader so existing Ditto datasets drop
straight into the pipeline:

  * pair TSV `left\\tright\\tlabel` — /root/reference/ditto_light/dataset.py:40-46
  * candidate JSONL `[left, right]`  — /root/reference/matcher.py:172-177
  * match JSONL `{left, right, match, match_confidence}` —
    /root/reference/matcher.py:156-160
  * results CSV with `match` + per-model `pred_*` columns —
    /root/reference/eval_ditto.py:113-117, /root/reference/f1.py:5
  * WDC gzip-JSONL corpus → COL/VAL pair rows —
    /root/reference/new_wdc/convert.py:7-29
  * task registry (configs.json) — /root/reference/train_ditto.py:57-59

Parsing notes: the reference splits pair lines on '\\t' (serialized entries
contain no tabs by construction); labels are int 0/1. We parse with
read.text + split rather than read.csv so embedded quotes in entity text
survive verbatim (csv quoting would corrupt COL/VAL strings).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F


def read_pairs_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S1: (left_txt, right_txt, label) from `left\\tright\\tlabel` lines."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    return lines.select(
        parts.getItem(0).alias("left_txt"),
        parts.getItem(1).alias("right_txt"),
        parts.getItem(2).cast("int").alias("label"),
    )


def read_candidates_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S2: candidate pairs from JSONL `[left, right]` rows."""
    # jsonlines arrays parse via from_json on the raw line (read.json wants
    # objects at top level; the reference emits bare 2-element arrays)
    lines = spark.read.text(path)
    arr = F.from_json(F.col("value"), "array<string>")
    return lines.select(
        arr.getItem(0).alias("left_txt"), arr.getItem(1).alias("right_txt")
    )


def write_matches_jsonl(matches: DataFrame, path: str) -> None:
    """S4: `{left, right, match, match_confidence}` JSONL
    (matcher.py:156-160 output contract)."""
    matches.select(
        F.col("left_txt").alias("left"),
        F.col("right_txt").alias("right"),
        F.col("match").cast("int").alias("match"),
        F.col("match_confidence").alias("match_confidence"),
    ).write.mode("overwrite").json(path)


def read_matches_jsonl(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.json(
        path,
        schema="left string, right string, match int, match_confidence double",
    )


def read_results_csv(spark: SparkSession, path: str) -> DataFrame:
    """S5: golden results CSV (header `,title,match,pred_*`)."""
    return spark.read.csv(path, header=True, inferSchema=True)


def append_pred_column(results: DataFrame, preds: DataFrame, colname: str,
                       key: str = "rid") -> DataFrame:
    """S5 append semantics (eval_ditto.py:113-117): join a prediction column
    onto the golden frame by row key."""
    return results.join(preds.select(key, F.col("pred").alias(colname)), key, "left")


def wdc_corpus_to_pairs(spark: SparkSession, path: str,
                        attrs: tuple[str, ...] = (
                            "brand", "title", "description", "price",
                            "priceCurrency",
                        )) -> DataFrame:
    """S6 (new_wdc/convert.py:7-29): gzip-JSONL rows with title_left/right
    etc. → COL/VAL serialized pair rows + label. Null attributes skipped
    (convert.py:13-14)."""
    df = spark.read.json(path)

    def side(suffix: str) -> F.Column:
        pieces = [
            F.when(
                F.col(f"{a}_{suffix}").isNotNull(),
                F.concat(F.lit(f"COL {a} VAL "), F.col(f"{a}_{suffix}").cast("string")),
            )
            for a in attrs
            if f"{a}_{suffix}" in df.columns
        ]
        return F.concat_ws(" ", *pieces)

    return df.select(
        side("left").alias("left_txt"),
        side("right").alias("right_txt"),
        F.col("label").cast("int").alias("label"),
    )


def load_task_registry(path: str) -> dict[str, dict]:
    """S11 (train_ditto.py:57-59): configs.json list → {name: config}."""
    with open(path) as f:
        configs = json.load(f)
    return {c["name"]: c for c in configs}
