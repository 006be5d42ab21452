"""P5 — data-augmentation / corruption operators.

The reference's Augmenter (/root/reference/ditto_light/augment.py:13-187)
implements token/column-level ops (`del`, `token_del`, `swap`,
`drop_token`, `drop_sym`, `drop_same`, `drop_len`, `ins`, `all`) used for
train-time MixDA. Training is out of scope here (we consume checkpoints),
so these ops serve two production roles instead:
  1. corruption model for planted-duplicate test corpora
     (ditto_spark.synth uses the same del/swap/ins model), and
  2. robustness augmentation for training-data pipelines (emit perturbed
     copies of documents at scale).

Deterministic by (seed, id): every op derives its randomness from
xxhash64(id, seed, position) — pure JVM expressions, zero Python, identical
output under any partitioning. (The reference uses global `random` state —
augment.py:31 — which is irreproducible under parallelism; determinism here
is semantics, not a bug-for-bug copy. NB augment.py:43's label slicing bug
is intent-replicated, not copied, per SURVEY.md P5.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def _rand01(id_col: F.Column, salt: F.Column | int, seed: int) -> F.Column:
    """Deterministic uniform [0,1) from (id, salt, seed)."""
    h = F.xxhash64(id_col, F.lit(seed), salt if isinstance(salt, F.Column) else F.lit(salt))
    return (F.pmod(h, F.lit(1_000_000)) / 1_000_000.0)


def token_del(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
              out_col: str = "augmented", p: float = 0.1, seed: int = 101) -> DataFrame:
    """Delete each token independently with probability p
    (augment.py token_del semantics), keeping at least one token."""
    toks = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.size(toks) - 1)
    kept = F.filter(
        F.zip_with(toks, idx, lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: _rand01(F.col(id_col), s["i"], seed) >= p,
    )
    out = F.when(F.size(kept) > 0, F.concat_ws(" ", F.transform(kept, lambda s: s["t"]))).otherwise(
        F.col(text_col)
    )
    return df.withColumn(out_col, out)


def token_swap(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
               out_col: str = "augmented", p: float = 0.1, seed: int = 202) -> DataFrame:
    """Swap adjacent token pairs (even positions) with probability p
    (augment.py swap semantics, adjacent-pair form)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), n - 1)
    swapped = F.transform(
        idx,
        lambda i: F.when(
            (i % 2 == 0) & (i + 1 < n) & (_rand01(F.col(id_col), i, seed) < p),
            F.element_at(toks, i + 2),  # 1-based element_at
        )
        .when(
            (i % 2 == 1) & (_rand01(F.col(id_col), i - 1, seed) < p),
            F.element_at(toks, i),  # token to the left (i-1 zero-based)
        )
        .otherwise(F.element_at(toks, i + 1)),
    )
    return df.withColumn(out_col, F.concat_ws(" ", swapped))


def drop_sym(df: DataFrame, text_col: str = "text",
             out_col: str = "augmented") -> DataFrame:
    """Remove non-alphanumeric symbols (augment.py drop_sym)."""
    return df.withColumn(
        out_col,
        F.trim(F.regexp_replace(
            F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9 ]+", " "), " +", " "
        )),
    )


def drop_same(df: DataFrame, text_col: str = "text",
              out_col: str = "augmented") -> DataFrame:
    """Deduplicate repeated tokens keeping first occurrence
    (augment.py drop_same)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    idx = F.sequence(F.lit(0), F.size(toks) - 1)
    firsts = F.filter(
        idx, lambda i: F.array_position(toks, F.element_at(toks, i + 1)) == i + 1
    )
    return df.withColumn(
        out_col,
        F.concat_ws(" ", F.transform(firsts, lambda i: F.element_at(toks, i + 1))),
    )


def drop_len(df: DataFrame, text_col: str = "text", out_col: str = "augmented",
             max_len: int = 12) -> DataFrame:
    """Drop tokens longer than max_len chars (augment.py drop_len)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    kept = F.filter(toks, lambda t: F.length(t) <= max_len)
    return df.withColumn(
        out_col,
        F.when(F.size(kept) > 0, F.concat_ws(" ", kept)).otherwise(F.col(text_col)),
    )


def augment_copies(df: DataFrame, n_copies: int = 2, id_col: str = "doc_id",
                   text_col: str = "text", p: float = 0.1,
                   seed: int = 303) -> DataFrame:
    """Emit n_copies perturbed variants per row (copy_idx ≥ 1) plus the
    original (copy_idx 0) — the scale-out augmentation pattern: explode
    first, then one deterministic token_del keyed by (id, copy_idx)."""
    copies = df.select(
        F.col(id_col), F.col(text_col),
        F.explode(F.sequence(F.lit(0), F.lit(n_copies))).alias("copy_idx"),
    )
    toks = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.size(toks) - 1)
    kept = F.filter(
        F.zip_with(toks, idx, lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: (F.col("copy_idx") == 0)
        | (_rand01(F.xxhash64(F.col(id_col), F.col("copy_idx")), s["i"], seed) >= p),
    )
    out = F.when(
        F.size(kept) > 0, F.concat_ws(" ", F.transform(kept, lambda s: s["t"]))
    ).otherwise(F.col(text_col))
    return copies.withColumn("augmented", out)
