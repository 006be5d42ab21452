"""P8/P9 — prompt rendering for LLM-matcher pipelines.

The reference feeds candidate pairs to GPT-style matchers in two forms:
* P8 CSV prompt rendering (/root/reference/convert_to_csv.py:7-48): strip
  language tags (`"@en` datatype suffixes from RDF-ish values) and quotes,
  rewrite `COL a VAL v` runs as `\\na: v` lines, truncate each line to
  1000 chars, then build `left\\n\\n###\\n\\nright\\n\\n###\\n\\nSame
  product?` with a ` yes`/` no` completion.
* P9 prompt templating (/root/reference/prompt_generator.py:7-31): a story
  preamble + two candidate sentences + question, assembled per pair.

Both are pure JVM string expressions here (regexp_replace / transform /
format_string — whole-stage codegen, no Python). The downstream matcher
call itself stays out of scope (external API; `scoring.score_pairs`'s
scorer_factory is the slot), but a user of the reference can produce
byte-identical prompt tables at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

LANGUAGE_TAG = '"@[a-z][a-z](-[a-zA-Z]*)?'
COLVAL = "COL ([a-zA-Z]+) VAL +"


def _clean_entry(col: F.Column, max_line_chars: int = 1000) -> F.Column:
    """convert_to_csv.py's per-entry pipeline: strip language tags, drop
    quotes, COL/VAL → `attr: value` lines, trim, truncate each line."""
    s = F.regexp_replace(col, LANGUAGE_TAG, "")
    s = F.regexp_replace(s, '"', "")
    s = F.regexp_replace(s, COLVAL, "\n$1: ")
    s = F.regexp_replace(s, "^\\s+|\\s+$", "")  # Python str.strip()
    lines = F.split(s, "\n")
    return F.concat_ws(
        "\n", F.transform(lines, lambda l: F.substring(l, 1, max_line_chars))
    )


def render_pair_csv(
    pairs: DataFrame,
    left_col: str = "left_txt",
    right_col: str = "right_txt",
    label_col: str = "label",
    question: str = "Same product?",
    max_line_chars: int = 1000,
) -> DataFrame:
    """P8: (left_txt, right_txt, label) → (left, right, match, prompt,
    completion) exactly as convert_to_csv.py writes its CSV rows."""
    left = _clean_entry(F.col(left_col), max_line_chars)
    right = _clean_entry(F.col(right_col), max_line_chars)
    keep = [c for c in pairs.columns if c not in (left_col, right_col, label_col)]
    return pairs.select(
        *keep,
        left.alias("left"),
        right.alias("right"),
        (F.col(label_col).cast("int") == 1).alias("match"),
        F.concat(
            left, F.lit("\n\n###\n\n"), right, F.lit(f"\n\n###\n\n{question}")
        ).alias("prompt"),
        F.when(F.col(label_col).cast("int") == 1, F.lit(" yes"))
        .otherwise(F.lit(" no"))
        .alias("completion"),
    )


def render_template_prompt(
    pairs: DataFrame,
    preamble: str,
    c1sentence: str,
    c2sentence: str,
    question: str,
    left_col: str = "left_txt",
    right_col: str = "right_txt",
    include_preamble: bool = True,
    out_col: str = "prompt",
) -> DataFrame:
    """P9 IntegrationPrompt.get_prompt (prompt_generator.py:15-19):
    [preamble\\n\\n] c1sentence\\ncand1\\n\\nc2sentence\\ncand2\\n\\nquestion."""
    body = F.concat(
        F.lit(c1sentence + "\n"), F.col(left_col),
        F.lit("\n\n" + c2sentence + "\n"), F.col(right_col),
        F.lit("\n\n" + question),
    )
    if include_preamble:
        body = F.concat(F.lit(preamble + "\n\n"), body)
    return pairs.withColumn(out_col, body)
