"""B1-B4 — candidate generation: MinHash-LSH over token shingles.

The reference blocks with dense SBERT embeddings + blocked matmul
(/root/reference/blocking/blocker.py:43-80, threshold branch 74-79, top-k
branch 67-72). Per BASELINE.json north_star we instead block with
MinHash-LSH over token shingles, realized as an equi-join on LSH band keys —
O(n·bands) shuffle instead of O(n²/tiles) matmul, which is what survives at
10^12 turns.

Design (all JVM expressions, whole-stage codegen; zero Python):
  tokens   = lowercased alnum runs of entity_text
  shingles = distinct n-gram shingles of the token stream
  minhash  = per conversation, sig[i] = min over shingles of xxhash64(xxhash64(shingle), seed_i)
             (one groupBy with num_perm min() aggregates — single shuffle,
             map-side partial aggregation)
  bands    = band_j = xxhash64(sig[j*r .. j*r+r-1]) → rows (conv_id, band_idx, band_key)
  pairs    = self-equi-join on (band_idx, band_key), left_id < right_id, distinct

Skew handling (north_rule "salted keys for skewed blocks"): hot band buckets
(near-identical template conversations all landing in one bucket) are split
into `ceil(size/max_bucket)` salt cells by xxhash64(conv_id); pairs are
generated within a salt cell only. Cross-cell pairs of a hot bucket are
recovered probabilistically by the OTHER b-1 bands (each band salts
independently), and deterministically by transitive clustering downstream —
a giant near-duplicate bucket is exactly the case where connected components
closes the gap. AQE skew-join splitting stays on as the second line of
defense.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

TOKEN_PATTERN = "[^a-z0-9]+"


def tokenize(df: DataFrame, text_col: str = "entity_text") -> DataFrame:
    """Add a `tokens` array column: lowercase alnum token stream."""
    return df.withColumn(
        "tokens",
        F.filter(
            F.split(F.lower(F.col(text_col)), TOKEN_PATTERN), lambda t: t != ""
        ),
    )


def shingle(df: DataFrame, n: int = 3, tokens_col: str = "tokens") -> DataFrame:
    """Add a distinct n-gram `shingles` array (token-level shingling).

    Documents shorter than n tokens get their whole token stream as one
    shingle so nothing is silently dropped.
    """
    toks = F.col(tokens_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return df.withColumn("shingles", F.array_distinct(grams))


def minhash_signatures(
    df: DataFrame,
    id_col: str = "conv_id",
    shingles_col: str = "shingles",
    num_perm: int = 64,
    seed: int = 1,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, shingles[]) → (id, sig: array<bigint> of length num_perm).

    sig[i] = min_{s in shingles} xxhash64(xxhash64(s), seed_i), computed as
    a pure narrow projection (array_min over a per-seed hash transform) —
    ZERO shuffle. An explode + groupBy(num_perm mins) computes the same
    values but pays a 6.5M-row shuffle at sf0.1 (measured 20s vs 2s on
    local[32]); at 10^12 turns the projection form keeps blocking's only
    shuffle the band equi-join itself.

    Two-level hashing: each shingle STRING is hashed exactly once to an
    int64, and the num_perm permutations re-hash that fixed-width integer
    (cheap) instead of re-scanning the variable-length string num_perm
    times. Same independent-family statistics (the inner hash is a
    bijection-quality compression of the shingle; the outer seeded hashes
    are the permutation family); measured 1.4-4x faster on the signature
    stage at sf0.1, identical LSH recall (pytest recall gates).
    """
    hashed = F.transform(F.col(shingles_col), lambda s: F.xxhash64(s))

    def _perm_hash(i: int):
        # NB: must be a ONE-arg lambda — a second parameter (even defaulted)
        # makes pyspark treat it as the (element, index) binary form
        seed_i = F.lit(seed * 1_000_003 + i)
        return lambda h: F.xxhash64(h, seed_i)

    df = df.withColumn("__sh64", hashed)
    mins = [
        F.array_min(F.transform(F.col("__sh64"), _perm_hash(i)))
        for i in range(num_perm)
    ]
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.array(*mins).alias("sig"),
    )


def lsh_bands(
    sig_df: DataFrame,
    id_col: str = "conv_id",
    num_bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Signature → (id, band_idx, band_key) rows; band_key hashes r
    consecutive signature components. num_bands*rows_per_band must not
    exceed the signature length."""
    bands = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(num_bands - 1)),
            lambda b: F.struct(
                b.alias("band_idx"),
                F.xxhash64(
                    F.concat_ws(
                        ":",
                        F.transform(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            lambda h: h.cast("string"),
                        ),
                    )
                ).alias("band_key"),
            ),
        )
    ).alias("band")
    return sig_df.select(id_col, bands).select(
        id_col, F.col("band.band_idx").alias("band_idx"), F.col("band.band_key").alias("band_key")
    )


def salt_cell_assignment(
    sized_bands: DataFrame,
    id_col: str = "conv_id",
    max_bucket: int = 200,
    salt_seed: int = 7,
    bucket_n_col: str = "bucket_n",
) -> DataFrame:
    """THE production salt-cell assignment, shared by candidates_from_bands
    and scripts/skew_drill.py's bucket histogram so the drill can never
    silently measure a split the pipeline no longer performs: given rows
    that carry their bucket size, add n_salts = ceil(size/max_bucket) and
    salt = pmod(xxhash64(id, salt_seed), n_salts). One place owns the
    formula, the seed, and the hash."""
    return sized_bands.withColumn(
        "n_salts",
        F.ceil(F.col(bucket_n_col) / F.lit(max_bucket)).cast("int"),
    ).withColumn(
        "salt",
        F.pmod(F.xxhash64(F.col(id_col), F.lit(salt_seed)), F.col("n_salts")),
    )


def candidates_from_bands(
    bands_df: DataFrame,
    id_col: str = "conv_id",
    max_bucket: int = 200,
    salt_seed: int = 7,
) -> DataFrame:
    """Self-equi-join on (band_idx, band_key) → distinct (left_id, right_id).

    Buckets larger than max_bucket are salted: each is split into
    ceil(size/max_bucket) cells by xxhash64(id) (salt_cell_assignment);
    the join key becomes (band_idx, band_key, salt). Bounds the worst
    bucket's pair count at ~max_bucket²/2 per cell instead of size²/2.

    Bucket sizes come from a count window over (band_idx, band_key) — ONE
    shuffle, computed where the data lives. (A groupBy+broadcast-join of the
    size table pulls ~|buckets| rows through the driver; measured to
    serialize blocking at higher core counts.)
    """
    from pyspark.sql import Window

    w = Window.partitionBy("band_idx", "band_key")
    salted = salt_cell_assignment(
        bands_df.withColumn("bucket_n", F.count(F.lit(1)).over(w)).where(
            F.col("bucket_n") > 1
        ),
        id_col=id_col,
        max_bucket=max_bucket,
        salt_seed=salt_seed,
    )
    left = salted.select(
        "band_idx", "band_key", "salt", F.col(id_col).alias("left_id")
    )
    right = salted.select(
        "band_idx", "band_key", "salt", F.col(id_col).alias("right_id")
    )
    # shuffle_hash: both sides are the same banded table; hashing one side
    # beats sort-merge's double sort (the build side per partition is
    # |bands|·n/parts compact rows)
    return (
        left.join(right.hint("shuffle_hash"), ["band_idx", "band_key", "salt"])
        .where(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id")
        .distinct()
    )


def estimated_jaccard(
    pairs: DataFrame, sig_df: DataFrame, id_col: str = "conv_id"
) -> DataFrame:
    """Attach the MinHash Jaccard estimate: fraction of agreeing signature
    components, zero Python.

    The signature side carries a 64-long array (~0.5 KB/row) — too wide to
    broadcast at corpus scale, and a sort-merge join would SORT the pair
    table twice with that payload attached (measured as the blocking
    stage's scaling drag). The shuffle_hash hint builds the hash map on the
    compact signature side and streams the pairs — no sort of either side."""
    ls = sig_df.select(F.col(id_col).alias("left_id"), F.col("sig").alias("lsig"))
    rs = sig_df.select(F.col(id_col).alias("right_id"), F.col("sig").alias("rsig"))
    joined = pairs.join(ls.hint("shuffle_hash"), "left_id").join(
        rs.hint("shuffle_hash"), "right_id"
    )
    agree = F.aggregate(
        F.zip_with("lsig", "rsig", lambda a, b: (a == b).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return joined.withColumn(
        "est_jaccard", agree / F.size("lsig")
    ).drop("lsig", "rsig")


def block_minhash_lsh(
    serialized: DataFrame,
    id_col: str = "conv_id",
    text_col: str = "entity_text",
    shingle_n: int = 2,
    num_perm: int = 64,
    num_bands: int = 21,
    rows_per_band: int = 3,
    max_bucket: int = 200,
    threshold: float | None = None,
    top_k: int | None = None,
    persist_sig: bool = True,
    sig_mode: str = "perm",
) -> DataFrame:
    """End-to-end blocking: serialized entities → candidate pairs with
    est_jaccard, optionally filtered by threshold (B2 analogue,
    blocker.py:74-79) and/or top-k per right id (B3, blocker.py:67-72).

    The signature stage is persisted by default: it feeds the band join,
    the bucket-size histogram, AND both sides of the jaccard-estimate join —
    without materialization the tokenize+shingle+hash projection re-executes
    4× (measured 80s → 29s at sf0.1). At cluster scale this persist is the
    `signatures` checkpoint table (north_rule lineage/resume).

    sig_mode: "perm" (default) = num_perm seeded int64 rehashes per
    shingle (minhash_signatures — measured fastest at num_perm=64); "oph"
    = one-permutation hashing (oph_signatures), the single-hash-pass
    construction. Identical downstream contract either way."""
    from pyspark.sql import Window

    assert num_bands * rows_per_band <= num_perm
    assert sig_mode in ("perm", "oph")
    shingled = shingle(tokenize(serialized, text_col), shingle_n)
    if sig_mode == "oph":
        sig = oph_signatures(shingled, id_col, num_bins=num_perm)
    else:
        sig = minhash_signatures(shingled, id_col, num_perm=num_perm)
    if persist_sig:
        sig = sig.persist()
    bands = lsh_bands(sig, id_col, num_bands, rows_per_band)
    pairs = candidates_from_bands(bands, id_col, max_bucket=max_bucket)
    pairs = estimated_jaccard(pairs, sig, id_col)
    if threshold is not None:
        pairs = pairs.where(F.col("est_jaccard") >= threshold)
    if top_k is not None:
        w = Window.partitionBy("right_id").orderBy(
            F.desc("est_jaccard"), F.asc("left_id")
        )
        pairs = (
            pairs.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= top_k)
            .drop("rk")
        )
    return pairs


def block_minhash_lsh_cross(
    table_a: DataFrame,
    table_b: DataFrame,
    id_col: str = "conv_id",
    text_col: str = "entity_text",
    shingle_n: int = 2,
    num_perm: int = 64,
    num_bands: int = 21,
    rows_per_band: int = 3,
    max_bucket: int = 200,
    salt_seed: int = 7,
    threshold: float | None = None,
    top_k: int | None = None,
    persist_sig: bool = True,
) -> DataFrame:
    """Two-table (cross-corpus) MinHash-LSH blocking — the reference's
    ER-Magellan / WDC setting, where candidates link table_a to table_b
    rather than a corpus to itself (/root/reference/blocking/blocker.py
    encodes table_a and table_b separately and matches across; the labeled
    pair files are cross-table by construction). Returns
    (left_id, right_id, est_jaccard) with left from A and right from B.

    Same construction as the self-join path (identical seeds — signatures
    of the two sides must be comparable), with the skew treatment adapted
    to the asymmetric join: a band bucket whose A-side exceeds
    `max_bucket` is split into ceil(n_a/max_bucket) cells; A rows hash
    into one cell, B rows REPLICATE across all cells of their bucket —
    every A-B pair of the bucket still meets in exactly the A row's cell
    (full within-bucket recall at any bucket size, unlike the self-join's
    probabilistic cross-cell recovery, which leans on CC downstream — a
    luxury two-table linkage does not have since its output IS the final
    pair set). Per-task width stays ~max_bucket A rows; the replication
    factor is bounded by the count window, not guessed.

    top_k keeps the best-k A-side candidates per B row (blocker.py:67-72
    ranks neighbors per query row)."""
    from pyspark.sql import Window

    assert num_bands * rows_per_band <= num_perm
    sig_a = minhash_signatures(
        shingle(tokenize(table_a, text_col), shingle_n), id_col, num_perm=num_perm
    )
    sig_b = minhash_signatures(
        shingle(tokenize(table_b, text_col), shingle_n), id_col, num_perm=num_perm
    )
    if persist_sig:
        sig_a = sig_a.persist()
        sig_b = sig_b.persist()
    bands_a = lsh_bands(sig_a, id_col, num_bands, rows_per_band).withColumn(
        "side", F.lit("a")
    )
    bands_b = lsh_bands(sig_b, id_col, num_bands, rows_per_band).withColumn(
        "side", F.lit("b")
    )
    w = Window.partitionBy("band_idx", "band_key")
    tagged = bands_a.unionByName(bands_b).withColumn(
        "n_salts",
        F.ceil(
            F.sum((F.col("side") == "a").cast("int")).over(w) / F.lit(max_bucket)
        ).cast("int"),
    )
    # n_salts = 0 ⇔ the bucket has no A rows: B rows there are filtered out
    # before the explode, so they never enter the join shuffle. (NB: Spark's
    # sequence(0, -1) is NOT empty — it auto-detects a negative step and
    # yields [0, -1], which would DOUBLE those rows instead of dropping
    # them; the explicit n_salts > 0 filter is load-bearing.)
    a_rows = tagged.where(F.col("side") == "a").select(
        "band_idx", "band_key",
        F.pmod(F.xxhash64(F.col(id_col), F.lit(salt_seed)), F.col("n_salts")).alias("salt"),
        F.col(id_col).alias("left_id"),
    )
    b_rows = (
        tagged.where((F.col("side") == "b") & (F.col("n_salts") > 0))
        .select(
            "band_idx", "band_key", F.col(id_col).alias("right_id"),
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("n_salts").cast("long") - 1)
            ).alias("salt"),
        )
    )
    cand = (
        a_rows.join(b_rows.hint("shuffle_hash"), ["band_idx", "band_key", "salt"])
        .select("left_id", "right_id")
        .dropDuplicates(["left_id", "right_id"])
    )
    ls = sig_a.select(F.col(id_col).alias("left_id"), F.col("sig").alias("lsig"))
    rs = sig_b.select(F.col(id_col).alias("right_id"), F.col("sig").alias("rsig"))
    agree = F.aggregate(
        F.zip_with("lsig", "rsig", lambda a, b: (a == b).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    pairs = (
        cand.join(ls.hint("shuffle_hash"), "left_id")
        .join(rs.hint("shuffle_hash"), "right_id")
        .withColumn("est_jaccard", agree / F.size("lsig"))
        .drop("lsig", "rsig")
    )
    if threshold is not None:
        pairs = pairs.where(F.col("est_jaccard") >= threshold)
    if top_k is not None:
        wk = Window.partitionBy("right_id").orderBy(
            F.desc("est_jaccard"), F.asc("left_id")
        )
        pairs = (
            pairs.withColumn("rk", F.row_number().over(wk))
            .where(F.col("rk") <= top_k)
            .drop("rk")
        )
    return pairs


def ngram_overlap_cross(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 8,
    min_common: int = 1,
    max_train_df: int | None = 10_000,
) -> DataFrame:
    """Benchmark decontamination: (train_id, bench_id, n_common,
    bench_overlap_frac) for every train/benchmark document pair sharing ≥
    `min_common` distinct token n-grams — the GPT-3-style n-gram
    contamination rule (13-grams there; n is a knob because the right n
    depends on tokenizer and document length). A training pipeline drops
    or flags every train_id that appears here.

    Scale shape: one exploded shingle table per side, equi-join on the
    shingle string, groupBy pair — the same prefix-filter skeleton as
    block_exact_shingles. `max_train_df` prunes shingles appearing in more
    than that many TRAIN docs before the join (boilerplate n-grams —
    headers, license text — would otherwise fan out quadratically);
    pruning is train-side only, so a benchmark n-gram can never be lost by
    benchmark-side statistics, and None disables pruning for strict
    audits. bench_overlap_frac = n_common / |bench doc's distinct
    shingles| — the usual flag-if-above-epsilon decision input."""
    tr = shingle(tokenize(train, text_col), shingle_n).select(
        F.col(id_col).alias("train_id"), F.explode("shingles").alias("s")
    )
    if max_train_df is not None:
        keep = tr.groupBy("s").agg(F.count(F.lit(1)).alias("df_cnt")).where(
            F.col("df_cnt") <= max_train_df
        )
        tr = tr.join(keep.select("s"), "s")
    be = shingle(tokenize(bench, text_col), shingle_n).select(
        F.col(id_col).alias("bench_id"), F.explode("shingles").alias("s")
    )
    bench_sizes = be.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("bench_shingles")
    )
    return (
        tr.join(be, "s")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= min_common)
        .join(bench_sizes, "bench_id")
        .select(
            "train_id",
            "bench_id",
            "n_common",
            (F.col("n_common") / F.col("bench_shingles")).alias(
                "bench_overlap_frac"
            ),
        )
    )


def block_exact_shingles(
    serialized: DataFrame,
    id_col: str = "conv_id",
    text_col: str = "entity_text",
    shingle_n: int = 3,
    min_common: int = 1,
    max_shingle_df: int = 100,
) -> DataFrame:
    """Oracle-friendly exact variant: candidates = pairs sharing ≥ min_common
    shingles, ignoring shingles whose document frequency exceeds
    max_shingle_df (stop-shingle pruning — the classic prefix-filter trick
    that keeps the self-join from exploding on common n-grams).

    SQL-expressible (DuckDB oracle in __spark_entry__.py), unlike the LSH
    path which is checked rows-only."""
    sh = shingle(tokenize(serialized, text_col), shingle_n).select(
        id_col, F.explode("shingles").alias("s")
    )
    rare = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df_cnt")).where(
        F.col("df_cnt") <= max_shingle_df
    )
    sh = sh.join(rare.select("s"), "s")
    l = sh.select(F.col("s"), F.col(id_col).alias("left_id"))
    r = sh.select(F.col("s"), F.col(id_col).alias("right_id"))
    return (
        l.join(r, "s")
        .where(F.col("left_id") < F.col("right_id"))
        .groupBy("left_id", "right_id")
        .agg(F.count(F.lit(1)).alias("common_shingles"))
        .where(F.col("common_shingles") >= min_common)
    )


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rank",
    parts: int | None = None,
) -> DataFrame:
    """0-based dense global row index over `order_cols` ascending (the
    order must be a total order — include a unique id as the last column).
    A plain `row_number() OVER (ORDER BY …)` funnels the corpus through
    ONE partition; this is the scale-safe two-phase form (the
    pack_pretraining_chunks idiom): range-repartition on the order
    columns, collect one tiny count row per partition to the driver,
    then assign offset + local position in a zero-exchange Arrow pass."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    spark = df.sparkSession
    n_parts = parts or spark.sparkContext.defaultParallelism * 2
    by_range = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    psums = {
        r["pid"]: r["c"]
        for r in by_range.groupBy("pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(psums):
        offsets[pid] = acc
        acc += psums[pid]
    schema = StructType(
        [f for f in by_range.schema.fields if f.name != "pid"]
        + [StructField(out_col, LongType())]
    )
    offs = dict(offsets)

    def _assign(batches):
        pos = None
        for b in batches:
            if len(b) == 0:
                continue
            if pos is None:
                pos = offs[int(b["pid"].iloc[0])]
            out = b.drop(columns=["pid"])
            out[out_col] = range(pos, pos + len(b))
            pos += len(b)
            yield out

    return by_range.mapInPandas(_assign, schema=schema)


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    w: int = 5,
    id_col: str = "doc_id",
    parts: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995, the merge/
    purge method — public; a blocking family the reference does not have):
    sort every record by (key, id) and emit each pair lying within a
    sliding window of `w` ranks as a candidate. Returns
    (left_id, right_id, rank_dist) with left before right in sort order,
    1 <= rank_dist < w, each unordered pair exactly once.

    Scale shape: the global rank comes from the two-phase distributed
    prefix count (`global_rank`) — no single-partition window. Pair
    generation is a banded self-equi-join on bucket = rank // w: the left
    side replicates to (bucket, bucket+1), the right side keeps its own
    bucket, and the filter 0 < rank_r - rank_l < w guarantees exactly-once
    production. The join key is a dense integer bucket holding exactly w
    ranks, so the shuffle is perfectly uniform no matter how skewed the
    sort keys are — the skew-vulnerable step (range sort) is handled by
    repartitionByRange's sampled range bounds."""
    ranked = global_rank(
        df.select(F.col(id_col), F.col(key_col).alias("snb_key")),
        order_cols=["snb_key", id_col],
    ).select(id_col, "rank")
    bucket = (F.col("rank") / w).cast("long")
    lhs = ranked.select(
        F.col(id_col).alias("left_id"),
        F.col("rank").alias("lrank"),
        F.explode(F.array(bucket, bucket + 1)).alias("b"),
    )
    rhs = ranked.select(
        F.col(id_col).alias("right_id"),
        F.col("rank").alias("rrank"),
        bucket.alias("b"),
    )
    return (
        lhs.join(rhs, "b")
        .where(
            (F.col("rrank") > F.col("lrank"))
            & (F.col("rrank") - F.col("lrank") < w)
        )
        .select(
            "left_id",
            "right_id",
            (F.col("rrank") - F.col("lrank")).cast("long").alias("rank_dist"),
        )
    )


def suffix_blocking_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str = "doc_id",
    min_suffix_len: int = 4,
    max_bucket: int = 50,
) -> DataFrame:
    """Suffix-array blocking (Aizawa & Oyama 2005; Febrl's suffix-array
    indexing — public; a blocking family the reference does not have):
    every suffix of the blocking key with length >= min_suffix_len is a
    block key, so records agreeing on any sufficiently long key TAIL
    become candidates — robust to prefix errors/truncations that defeat
    equi-key and sorted-neighborhood blocking. Keys shorter than
    min_suffix_len contribute the whole key. Suffixes shared by more than
    `max_bucket` records are dropped — the method's standard frequency
    cut: a ubiquitous suffix carries no discriminating power, and it is
    exactly the skewed key. Returns distinct (left_id, right_id),
    left < right.

    Scale shape: suffix generation is a zero-shuffle codegen projection
    (sequence + transform, <= len(key) rows per record); then one
    suffix-keyed count agg and one self-equi-join — every join key is
    capped at max_bucket rows BEFORE the join (<= max_bucket²/2 pairs
    from the worst key), the same pre-join skew bound as
    candidates_from_bands. Dedup shuffles bare id pairs only. Positions
    are character-based in both engines (identical on ASCII keys)."""
    k = F.col(key_col)
    suf = df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(
                        F.length(k) - F.lit(min_suffix_len - 1), F.lit(1)
                    ),
                ),
                lambda i: k.substr(i, F.length(k)),
            )
        ).alias("s"),
    )
    kept = (
        suf.groupBy("s")
        .agg(F.count(F.lit(1)).alias("c"))
        .where((F.col("c") >= 2) & (F.col("c") <= max_bucket))
        .select("s")
    )
    f = suf.join(kept, "s")
    return (
        f.select("s", F.col(id_col).alias("left_id"))
        .join(f.select("s", F.col(id_col).alias("right_id")), "s")
        .where(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id")
        .distinct()
    )


def meta_blocking_wnp(
    blocks: DataFrame,
    block_col: str = "block_key",
    id_col: str = "doc_id",
    max_block_size: int | None = 50,
) -> DataFrame:
    """Meta-blocking with weighted node pruning (Papadakis et al. 2014,
    "Meta-Blocking: Taking Entity Resolution to the Next Level", TKDE —
    public; a blocking-refinement family the reference does not have).
    Input: a redundancy-positive block collection (block_key, id). Output:
    the pruned candidate edges (left_id, right_id, weight) where weight is
    the CBS (common-blocks scheme) count and an edge survives WNP if its
    weight reaches the mean incident-edge weight of EITHER endpoint — the
    redundancy-positive variant that keeps an edge both nodes only weakly
    disagree on.

    Scale shape: block purging (drop blocks larger than max_block_size)
    bounds the per-block self-join at max_block_size² rows per block —
    oversized blocks are exactly the ones meta-blocking theory says carry
    no signal (a stopword-like key relates everything to everything). The
    edge weights are one groupBy; node thresholds are one explode + groupBy
    over edges; the final filter joins the (|nodes|-sized) threshold table
    twice on an integer key. The mean comparison is done in exact integer
    arithmetic (w·deg ≥ Σw, never float) so the DuckDB oracle matches
    bit-for-bit."""
    b = blocks.select(
        F.col(block_col).alias("bk"), F.col(id_col).alias("nid")
    ).distinct()
    if max_block_size is not None:
        keep = (
            b.groupBy("bk")
            .agg(F.count(F.lit(1)).alias("bsz"))
            .where(F.col("bsz") <= max_block_size)
            .select("bk")
        )
        b = b.join(keep, "bk")
    edges = (
        b.alias("l")
        .join(b.alias("r"), "bk")
        .where(F.col("l.nid") < F.col("r.nid"))
        .groupBy(
            F.col("l.nid").alias("left_id"), F.col("r.nid").alias("right_id")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )
    thresholds = (
        edges.select(
            F.explode(F.array("left_id", "right_id")).alias("node"), "weight"
        )
        .groupBy("node")
        .agg(F.sum("weight").alias("sw"), F.count(F.lit(1)).alias("deg"))
    )
    tl = thresholds.withColumnsRenamed(
        {"node": "left_id", "sw": "sw_l", "deg": "deg_l"}
    )
    tr = thresholds.withColumnsRenamed(
        {"node": "right_id", "sw": "sw_r", "deg": "deg_r"}
    )
    return (
        edges.join(tl, "left_id")
        .join(tr, "right_id")
        .where(
            (F.col("weight") * F.col("deg_l") >= F.col("sw_l"))
            | (F.col("weight") * F.col("deg_r") >= F.col("sw_r"))
        )
        .select("left_id", "right_id", "weight")
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003,
    the MOSS scheme — public): hash every token k-gram, slide a window of
    w consecutive gram hashes, and in each window select the minimum hash
    (ties → rightmost occurrence). Guarantees at least one fingerprint in
    every w-gram window while keeping the fingerprint density ~2/(w+1) —
    the standard robust alternative to fixed-stride sampling for
    plagiarism/near-dup detection. Returns distinct (id, fp, fp_pos).

    Implementation is a single JVM expression chain: positional grams via
    transform+posexplode (NOT the dedup'd `shingle` array), md5 gram hash,
    and the argmin-with-rightmost-tie-break encoded as the plain string
    minimum of md5hex || zero-padded(MAXP − pos) over a bounded window
    frame — portable to the DuckDB oracle verbatim. The only shuffle is
    the per-document sort for the window, whose partitions are bounded by
    document length (never a global window); documents shorter than w
    grams keep their final window so nothing is silently dropped.
    Position padding supports documents up to 10^9 grams."""
    from pyspark.sql import Window

    MAXP = 999_999_999
    toks = F.col("tokens")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    g = (
        tokenize(df, text_col)
        .where(F.size(toks) >= k)  # <k tokens: no full gram, no fingerprint
        .select(F.col(id_col), F.posexplode(grams).alias("pos", "g"))
    )
    key = F.concat(F.md5("g"), F.format_string("%09d", MAXP - F.col("pos")))
    order = Window.partitionBy(id_col).orderBy("pos")
    frame = order.rowsBetween(-(w - 1), 0)
    sel = (
        g.select(
            F.col(id_col),
            F.row_number().over(order).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy(id_col)).alias("cnt"),
            F.min(key).over(frame).alias("mk"),
        )
        .where(
            (F.col("rn") >= w) | ((F.col("cnt") < w) & (F.col("rn") == F.col("cnt")))
        )
        .select(
            F.col(id_col),
            F.substring("mk", 1, 32).alias("fp"),
            (MAXP - F.substring("mk", 33, 9).cast("long")).alias("fp_pos"),
        )
        .distinct()
    )
    return sel


def winnow_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
    max_df: int = 50,
    min_shared: int = 2,
) -> DataFrame:
    """Near-dup candidates from shared winnowed fingerprints (the MOSS
    match step): documents sharing ≥ min_shared distinct selected
    fingerprints, with boilerplate fingerprints (document frequency >
    max_df) purged before the quadratic step — the same
    bound-before-self-join discipline as block purging / rare-shingle
    blocking. Output (left_id, right_id, shared_fp)."""
    fp = (
        winnow_fingerprints(df, id_col, text_col, k=k, w=w)
        .select(F.col(id_col).alias("nid"), "fp")
        .distinct()
    )
    keep = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("dfc"))
        .where(F.col("dfc") <= max_df)
        .select("fp")
    )
    f = fp.join(keep, "fp")
    return (
        f.alias("l")
        .join(f.alias("r"), "fp")
        .where(F.col("l.nid") < F.col("r.nid"))
        .groupBy(
            F.col("l.nid").alias("left_id"), F.col("r.nid").alias("right_id")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fp"))
        .where(F.col("shared_fp") >= min_shared)
    )


def allpairs_jaccard_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_n: int = 1,
    positional: bool = True,
    debug_counts: dict | None = None,
) -> DataFrame:
    """Exact all-pairs Jaccard threshold self-join via prefix filtering
    (Bayardo, Ma & Srikant WWW'07 "Scaling Up All Pairs Similarity
    Search" / Xiao et al. PPJoin — public algorithms). Unlike the
    rare-shingle join (`shingle`/max_df pruning, which silently loses
    pairs that share only frequent tokens), the prefix filter is
    LOSSLESS for the given threshold: tokens are globally ordered by
    (document frequency asc, token), and a pair with J >= t must share
    at least one token inside each side's first len - ceil(t*len) + 1
    tokens of that order — so joining prefix-to-prefix finds every
    qualifying pair, and an exact set-intersection verify removes the
    rest. Output (left_id, right_id, jaccard) over distinct token sets.

    Scale shape: the inverted index holds PREFIX tokens only — each
    document contributes its (1-t)-fraction rarest tokens, so the join
    key distribution is biased away from hot tokens by construction
    (the skew-prone frequent tokens sit in suffixes and never enter the
    index). The PPJoin length filter (t*|A| <= |B| <= |A|/t) prunes
    candidates inside the join before the verify attach, and with
    ``positional=True`` the PPJoin positional filter additionally kills
    matched-token rows whose best-case overlap 1 + min(|A|-i, |B|-j)
    cannot reach the t/(1+t)·(|A|+|B|) overlap threshold — still
    lossless (see inline proof), smaller dedup shuffle. Verification
    joins the full sorted-token arrays once per surviving candidate and
    computes F.size(array_intersect) in the JVM — no Python, no
    re-shuffle of the corpus. The per-doc rank window is partitioned by
    document (bounded by document length, never global)."""
    from pyspark.sql import Window

    t = float(threshold)

    def elements(d: DataFrame) -> DataFrame:
        """Distinct set elements per doc: tokens (shingle_n=1) or token
        n-gram shingles — shingles are the discriminative choice when
        the token vocabulary is small relative to document length."""
        tk = tokenize(d, text_col)
        if shingle_n > 1:
            tk = (
                shingle(tk, n=shingle_n)
                .where(F.size("tokens") >= shingle_n)
                .select(F.col(id_col), F.col("shingles").alias("el"))
            )
        else:
            tk = tk.select(
                F.col(id_col), F.array_distinct("tokens").alias("el")
            )
        return tk

    # the exploded element table feeds BOTH the df counts and the ranked
    # index — persist it or the tokenize/shingle projection runs twice
    toks = (
        elements(df)
        .select(F.col(id_col), F.explode("el").alias("tok"))
        .persist()
    )
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("dfc"))
    ranked = (
        toks.join(dfreq, "tok")
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy("dfc", "tok")
            ),
        )
        .withColumn(
            "len", F.count(F.lit(1)).over(Window.partitionBy(id_col))
        )
    )
    # ceil over a float product is UNSAFE for losslessness: 0.56*25 is
    # 14.000000000000002 in doubles, so a bare ceil shortens the prefix by
    # one and drops qualifying pairs. Biasing down by 1e-9 before the ceil
    # errs on the long-prefix side (still lossless, at worst one extra
    # candidate element) for any threshold not itself within 1e-9 of a
    # rational boundary. The oracle carries the identical expression.
    prefix = ranked.where(
        F.col("rnk")
        <= F.col("len") - F.ceil(F.lit(t) * F.col("len") - F.lit(1e-9)) + 1
    ).select(id_col, "tok", "rnk", "len")

    l = prefix.select(
        F.col(id_col).alias("left_id"),
        "tok",
        F.col("rnk").alias("ra"),
        F.col("len").alias("la"),
    )
    r = prefix.select(
        F.col(id_col).alias("right_id"),
        "tok",
        F.col("rnk").alias("rb"),
        F.col("len").alias("lb"),
    )
    joined = l.join(r, "tok").where(
        (F.col("left_id") < F.col("right_id"))
        # same float-boundary bias as the prefix ceil: t*len can land a
        # hair ABOVE an exact integer (0.56*25 = 14.000000000000002) and
        # reject a pair with J exactly = t
        & (F.col("lb") * F.lit(t) - F.lit(1e-9) <= F.col("la"))
        & (F.col("la") * F.lit(t) - F.lit(1e-9) <= F.col("lb"))
    )
    if positional:
        # PPJoin positional filter (Xiao et al. WWW'08; set-oriented form
        # per Vernica et al. SIGMOD'10): J >= t forces overlap
        # I >= alpha = ceil(t/(1+t) * (la+lb)); for the FIRST common prefix
        # token (positions ra, rb in the full frequency order) no common
        # token precedes it, so I <= 1 + min(la-ra, lb-rb). A qualifying
        # pair therefore always has at least one matched-token row passing
        # 1 + min(la-ra, lb-rb) >= alpha — filtering rows (not pairs) stays
        # LOSSLESS, while non-first matches of junk pairs die here instead
        # of surviving to the dedup shuffle and set-verify join.
        alpha = F.ceil(
            F.lit(t / (1.0 + t)) * (F.col("la") + F.col("lb")) - F.lit(1e-9)
        )
        joined = joined.where(
            F.lit(1)
            + F.least(F.col("la") - F.col("ra"), F.col("lb") - F.col("rb"))
            >= alpha
        )
    cand = joined.select("left_id", "right_id").dropDuplicates(
        ["left_id", "right_id"]
    )
    if debug_counts is not None:
        debug_counts["candidates"] = cand.count()

    # verify-side sets only for docs that actually appear in a candidate —
    # the verify cost scales with the candidate set, not the corpus
    cand_ids = (
        cand.select(F.col("left_id").alias(id_col))
        .unionAll(cand.select(F.col("right_id").alias(id_col)))
        .distinct()
    )
    sets = elements(df.join(cand_ids, id_col, "left_semi")).select(
        F.col(id_col), F.array_sort(F.array_distinct("el")).alias("ts")
    )
    la = sets.select(F.col(id_col).alias("left_id"), F.col("ts").alias("ta"))
    rb = sets.select(F.col(id_col).alias("right_id"), F.col("ts").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb")).cast("double")
    union = (F.size("ta") + F.size("tb")).cast("double") - inter
    return (
        cand.join(la, "left_id")
        .join(rb, "right_id")
        .select(
            "left_id", "right_id", (inter / union).alias("jaccard")
        )
        .where(F.col("jaccard") >= t)
    )


def edit_distance_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """Exact edit-distance threshold self-join via q-gram prefix filtering
    (Gravano et al. VLDB'01 q-gram count/length filters; EDJoin, Xiao et
    al. VLDB'08 — public algorithms): every pair with
    levenshtein(a, b) <= max_dist is returned, never an all-pairs join.

    Why it is LOSSLESS: one edit operation destroys at most q of a
    string's q-grams, so ed <= d implies the two (distinct-)gram sets
    share at least max(|Q1|,|Q2|) - q*d grams — by the standard prefix
    lemma the pair must then collide inside each side's first q*d + 1
    grams of a global total order. Grams are ordered by (document
    frequency asc, gram), the same rarest-first discipline as
    `allpairs_jaccard_join`: hot grams sit in suffixes and never enter
    the inverted index unless a string is too short to push them out.
    Strings are padded with chr(1)/chr(2) sentinels (q-1 each side) so
    even empty strings carry >= 1 gram, and identical padding on both
    sides leaves the edit distance unchanged. The one hole in the prefix
    lemma is pairs where BOTH distinct-gram counts are <= q*d (the
    required-overlap bound drops to zero, so they may share no gram at
    all — e.g. '' vs 'a'): rows that short additionally emit a constant
    sentinel gram, putting the whole <= q*d-gram population (raw length
    bounded by ~q*d + q) in one bucket that the length filter prunes and
    the exact verify settles. A corpus with millions of such near-empty
    strings concentrates that bucket — they are genuine <= d matches of
    each other, so that cost is the answer's own size, not the filter's.

    Candidates additionally pass the length filter
    abs(len(a) - len(b)) <= d inside the gram join, dedup on BARE id
    pairs, and verify with the JVM `levenshtein` on the raw strings —
    attached once per surviving candidate, scaling with the candidate
    set, not the corpus. Output (left_id, right_id, dist), dist <= d.
    """
    from pyspark.sql import Window

    d = int(max_dist)
    prefix_len = q * d + 1
    pad_l = F.expr(f"repeat(chr(1), {q - 1})")
    pad_r = F.expr(f"repeat(chr(2), {q - 1})")
    padded = F.concat(pad_l, F.col(text_col), pad_r)
    base = df.select(
        F.col(id_col),
        F.col(text_col).alias("_s"),
        F.length(text_col).alias("_n"),
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, length(concat(repeat(chr(1), {q-1}), "
                f"{text_col}, repeat(chr(2), {q-1}))) - {q - 1}), "
                f"i -> substr(concat(repeat(chr(1), {q-1}), {text_col}, "
                f"repeat(chr(2), {q-1})), i, {q}))"
            )
        ).alias("_grams"),
    )
    toks = base.select(
        F.col(id_col), "_n", F.explode("_grams").alias("g")
    ).persist()
    dfreq = toks.groupBy("g").agg(F.count(F.lit(1)).alias("dfc"))
    pref = (
        toks.join(dfreq, "g")
        .withColumn(
            "rnk",
            F.row_number().over(Window.partitionBy(id_col).orderBy("dfc", "g")),
        )
        .where(F.col("rnk") <= prefix_len)
        .select(id_col, "g", "_n")
    )
    short = base.where(F.size("_grams") <= q * d).select(
        F.col(id_col), F.lit("\x00short").alias("g"), F.col("_n")
    )
    pref = pref.unionByName(short)
    l = pref.select(F.col(id_col).alias("left_id"), "g", F.col("_n").alias("na"))
    r = pref.select(F.col(id_col).alias("right_id"), "g", F.col("_n").alias("nb"))
    cand = (
        l.join(r, "g")
        .where(
            (F.col("left_id") < F.col("right_id"))
            & (F.abs(F.col("na") - F.col("nb")) <= d)
        )
        .select("left_id", "right_id")
        .dropDuplicates(["left_id", "right_id"])
    )
    sa = base.select(F.col(id_col).alias("left_id"), F.col("_s").alias("sa"))
    sb = base.select(F.col(id_col).alias("right_id"), F.col("_s").alias("sb"))
    return (
        cand.join(sa, "left_id")
        .join(sb, "right_id")
        .withColumn("dist", F.levenshtein("sa", "sb"))
        .where(F.col("dist") <= d)
        .select("left_id", "right_id", "dist")
    )


def bbit_minhash_pack(
    sig_df: DataFrame,
    num_perm: int = 64,
    b: int = 2,
    id_col: str = "conv_id",
    sig_col: str = "sig",
) -> DataFrame:
    """(id, sig: array<bigint>[num_perm]) → (id, bsig: array<bigint>) with
    only the lowest b bits of each permutation kept, packed 64/b fields per
    word — b-bit minwise hashing (Li & König, "b-Bit Minwise Hashing",
    WWW 2010 — public algorithm).

    Why at 10^12 turns: the full 64-bit signature is num_perm·8 bytes per
    row (1 KB/doc at 128 perms → ~1 PB of signature payload through every
    signature-carrying shuffle or signature store). b=2 packs the same 128
    perms into 4 longs (32 B) — a 32x cut in signature bytes — paid for by
    extra estimator variance that `bbit_jaccard_estimate` corrects for
    (divide out the 1/2^b accidental-collision floor); the paper shows
    accuracy is recovered with ~1.3-1.5x more permutations at b∈{1,2},
    still a >20x net byte win.

    Pure narrow projection (zero shuffle), like minhash_signatures: field
    j of word w packs (sig[w·k + j] & (2^b − 1)) << (b·j), k = 64/b.
    `num_perm` must equal the signature length (the array schema does not
    carry its arity, and a static value keeps the packing a flat codegen
    projection — no higher-order functions). b must divide 64 and num_perm
    must be a multiple of k.
    """
    if 64 % b != 0:
        raise ValueError(f"b must divide 64, got {b}")
    k = 64 // b
    if num_perm % k != 0:
        raise ValueError(f"num_perm must be a multiple of {k} for b={b}")
    mask = (1 << b) - 1

    def word(w: int):
        out = None
        for j in range(k):
            f = F.shiftleft(
                F.element_at(F.col(sig_col), w * k + j + 1).bitwiseAND(mask),
                b * j,
            )
            out = f if out is None else out.bitwiseOR(f)
        return out

    return sig_df.select(
        F.col(id_col),
        F.array(*[word(w) for w in range(num_perm // k)]).alias("bsig"),
    )


def bbit_jaccard_estimate(
    pairs: DataFrame,
    b: int = 2,
    left_col: str = "left_bsig",
    right_col: str = "right_bsig",
    out_col: str = "est_jaccard",
) -> DataFrame:
    """Adds the unbiased b-bit Jaccard estimate for rows carrying two
    packed signatures (`bbit_minhash_pack` output): matched b-bit fields
    underestimate nothing but collide accidentally with prob C ≈ 1/2^b, so
      Ĵ = (P_match − C) / (1 − C),  clamped to [0, 1]
    (Li & König 2010, eq. 5 in the D→∞ / small-fraction regime that a
    shingle space of 64-bit hashes is in).

    Field matching is bit-parallel on the packed words — XOR, OR-fold the
    b bit-planes, one bit_count per word — so the comparison cost per pair
    is num_perm·b/64 long ops, not num_perm element compares. All JVM
    expressions inside whole-stage codegen.
    """
    if 64 % b != 0:
        raise ValueError(f"b must divide 64, got {b}")
    k = 64 // b
    # repeating mask with bit 0 of every b-bit field set: 0b01 01 01... for b=2
    lsb_mask = 0
    for j in range(k):
        lsb_mask |= 1 << (b * j)
    if lsb_mask >= 1 << 63:  # b=1: all 64 bits set — signed int64 form
        lsb_mask -= 1 << 64

    def mismatches(l, r):
        x = l.bitwiseXOR(r)
        folded = x
        for shift in range(1, b):
            folded = folded.bitwiseOR(F.shiftrightunsigned(x, shift))
        return F.bit_count(folded.bitwiseAND(F.lit(lsb_mask)))

    n_perm = F.size(F.col(left_col)) * k
    n_mismatch = F.aggregate(
        F.zip_with(F.col(left_col), F.col(right_col), mismatches),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    p_match = (n_perm - n_mismatch).cast("double") / n_perm.cast("double")
    c = 1.0 / float(2**b)
    est = (p_match - F.lit(c)) / F.lit(1.0 - c)
    return pairs.withColumn(
        out_col, F.greatest(F.least(est, F.lit(1.0)), F.lit(0.0))
    )


def oph_signatures(
    df: DataFrame,
    id_col: str = "conv_id",
    shingles_col: str = "shingles",
    num_bins: int = 64,
    seed: int = 1,
    hash_fn=None,
    tag_fn=None,
) -> DataFrame:
    """One-permutation hashing with rotation densification (Li, Owen &
    Zhang NIPS 2012; Shrivastava & Li ICML 2014 — public algorithms): an
    O(|shingles|)-HASH MinHash signature — one hash evaluation per shingle
    vs the classic one-per-(shingle, permutation).

    Measured caveat (honest numbers, sf0.1-scale transcripts, local[8],
    min of 3): this repo's minhash_signatures already collapses the
    per-permutation cost to an int64 rehash via two-level hashing, and at
    num_perm=64 that path runs the signature stage ~3x FASTER than this
    OPH implementation (2.2 s vs 6.2 s) — the O(num_bins·|shingles|)
    bin-filter compares plus the densification scan outweigh the saved
    integer rehashes at this width. OPH is kept as the standard
    single-hash-pass construction (contract-compatible via sig_mode="oph"
    everywhere signatures are consumed): its win materializes when
    signatures must come from ONE pass over the shingles (very large
    num_perm, or an expensive/streamed hash), not at the pipeline default.

    Construction: each shingle hashes ONCE to h = xxhash64(shingle, seed);
    bin = pmod(h, num_bins) splits the hash space into num_bins ranges;
    sig[i] = min h over the row's shingles landing in bin i. Empty bins
    (short documents) densify by borrowing the nearest non-empty bin to
    the RIGHT (circular): the densified value is xxhash64(borrowed_min,
    borrow_distance), so two signatures agree on a densified bin iff they
    borrowed the same value from the SAME distance — the Shrivastava-Li
    collision rule — while filled bins (distance 0) keep min-equality
    semantics through the same tagging hash. Rows with NO shingles get a
    constant sentinel signature (they only match each other).

    Same output contract as minhash_signatures — (id, sig: array<bigint>)
    — so lsh_bands / estimated_jaccard / bbit_minhash_pack compose
    unchanged. Zero shuffle: one narrow projection; the rotation search is
    array ops (doubled-array slice + first-non-null) inside codegen.

    hash_fn (string col → bigint col) and tag_fn ((value, distance) bigint
    cols → bigint col) default to xxhash64 — the fast JVM production path.
    Pass engine-portable hashes (e.g. md5-prefix → conv) to make the whole
    construction replicable in ANSI SQL for oracle checking; the structure
    (binning, per-bin min, rotation densification) is identical either way.
    """
    if hash_fn is None:
        hash_fn = lambda s: F.xxhash64(s, F.lit(seed))  # noqa: E731
    if tag_fn is None:
        tag_fn = lambda v, d: F.xxhash64(v, d)  # noqa: E731
    hcol = F.transform(F.col(shingles_col), hash_fn)
    with_h = df.withColumn("__h1", hcol)
    raw = F.array(
        *[
            F.array_min(
                F.filter(F.col("__h1"), lambda h: F.pmod(h, num_bins) == i)
            )
            for i in range(num_bins)
        ]
    )
    with_m = with_h.withColumn("__m2", F.concat(raw, raw))

    def densify(i):
        # nearest non-empty bin to the right = min index j in [i, i+nb)
        # with m2[j] non-null — int arithmetic only (a struct-tagging
        # formulation measured 4x slower: per-element boxing dominates)
        pos = F.array_min(
            F.transform(
                F.sequence(F.lit(i), F.lit(i + num_bins - 1)),
                lambda j: F.when(
                    F.element_at(F.col("__m2"), j + 1).isNotNull(), j
                ),
            )
        )
        return F.when(
            pos.isNotNull(),
            tag_fn(
                F.element_at(F.col("__m2"), pos + 1),
                (pos - F.lit(i)).cast("int"),
            ),
        ).otherwise(F.lit(0))

    return with_m.select(
        F.col(id_col),
        F.array(*[densify(i) for i in range(num_bins)]).alias("sig"),
    )


def df_weight_expr(df_cnt, n_docs, max_weight: int = 4, base: int = 4):
    """Integer IDF-quantized token weight from document frequency — EXACT
    integer arithmetic, no float log, so the weight (and everything built
    on it) is bit-identical cross-engine:

        weight = 1 + max{ k <= max_weight-1 : df_cnt * base^k <= n_docs }

    i.e. a token in <= n/4 of docs weighs 2, <= n/16 weighs 3, <= n/64
    weighs 4 (base=4, max_weight=4). Evaluated as a descending CASE chain
    of bigint multiplies."""
    expr = None
    for k in range(max_weight - 1, 0, -1):
        cond = df_cnt * F.lit(base**k) <= n_docs
        expr = (
            F.when(cond, F.lit(k + 1))
            if expr is None
            else expr.when(cond, F.lit(k + 1))
        )
    return expr.otherwise(F.lit(1)) if expr is not None else F.lit(1)


def weighted_replicas_expr(tokens_col, weights_col, max_weight: int = 4):
    """Chum et al. 2008 integer-weight replication as a PURE codegen
    expression: token t with weight w expands to replicas t#1..t#min(w,
    max_weight), so plain (unweighted) Jaccard over the replica sets EQUALS
    the integer-weighted Jaccard over the token sets — which turns any
    unweighted MinHash/OPH signature into a weighted-Jaccard LSH. Zero
    shuffle given aligned tokens/weights arrays."""
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    w = F.col(weights_col) if isinstance(weights_col, str) else weights_col
    return F.flatten(
        F.zip_with(
            t,
            w,
            lambda tok, wt: F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(
                        F.least(wt, F.lit(max_weight)), F.lit(1)
                    ).cast("int"),
                ),
                lambda i: F.concat_ws("#", tok, i.cast("string")),
            ),
        )
    )


def weighted_token_replicas(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    weight_df: DataFrame,
    max_weight: int = 4,
    broadcast_weights: bool = True,
    out_col: str = "wshingles",
) -> DataFrame:
    """Relational replica construction for corpus-scale weight tables:
    explode DISTINCT tokens, join (token, weight), expand replicas, gather
    back to (id, wshingles). One join + one groupBy; rows are bare
    (id, token) — replica strings are built AFTER the join. Tokens absent
    from weight_df default to weight 1. Use weighted_replicas_expr instead
    when weights already ride the row (zero-shuffle)."""
    ex = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.col(tokens_col))).alias("token"),
    )
    w = weight_df.select("token", "weight")
    if broadcast_weights:
        w = F.broadcast(w)
    j = ex.join(w, "token", "left").select(
        F.col(id_col),
        "token",
        F.coalesce("weight", F.lit(1)).alias("w"),
    )
    reps = j.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(
                        F.least(F.col("w"), F.lit(max_weight)), F.lit(1)
                    ).cast("int"),
                ),
                lambda i: F.concat_ws("#", F.col("token"), i.cast("string")),
            )
        ).alias("r"),
    )
    return reps.groupBy(id_col).agg(F.collect_list("r").alias(out_col))


def weighted_minhash_lsh(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    num_bands: int = 16,
    rows_per_band: int = 4,
    max_bucket: int = 200,
    max_weight: int = 4,
    threshold: float | None = None,
    sig_mode: str = "perm",
    shingle_n: int | None = None,
) -> DataFrame:
    """End-to-end IDF-weighted MinHash-LSH blocking: rare-token agreement
    drives candidate generation the way it drives
    scoring.score_pairs_weighted_jaccard's verify — two docs sharing one
    rare identifier token surface as candidates even when their overall
    token overlap is tiny (plain Jaccard LSH misses exactly these).

    Pipeline: tokenize → corpus DF index (one agg over bare (id, token)
    rows) → integer weights via df_weight_expr (exact arithmetic) →
    replica expansion (Chum reduction) → standard signature / band /
    salted-bucket machinery, unchanged. est_jaccard on the output
    estimates the WEIGHTED Jaccard. Replica volume is bounded by
    max_weight× the distinct-token volume, and only bare (id, replica)
    rows enter the gather shuffle.

    shingle_n: None weighs unigram tokens (identifier-style matching);
    an int weighs n-gram shingles instead (document near-dup granularity —
    rare PHRASES outweigh boilerplate phrases), same construction."""
    toks = tokenize(df, text_col)
    unit_col = "tokens"
    if shingle_n is not None:
        toks = shingle(toks, n=shingle_n)
        unit_col = "shingles"
    ex = toks.select(
        F.col(id_col), F.explode(F.array_distinct(unit_col)).alias("token")
    )
    dfx = ex.groupBy("token").agg(F.count(F.lit(1)).alias("df_cnt"))
    n = toks.select(F.count(F.lit(1)).alias("__n"))
    w = dfx.crossJoin(F.broadcast(n)).select(
        "token",
        df_weight_expr(F.col("df_cnt"), F.col("__n"), max_weight).alias(
            "weight"
        ),
    )
    rep = weighted_token_replicas(toks, id_col, unit_col, w, max_weight)
    if sig_mode == "oph":
        sig = oph_signatures(
            rep, id_col, shingles_col="wshingles", num_bins=num_perm
        )
    else:
        sig = minhash_signatures(
            rep, id_col, shingles_col="wshingles", num_perm=num_perm
        )
    sig = sig.persist()
    bands = lsh_bands(sig, id_col, num_bands, rows_per_band)
    pairs = candidates_from_bands(bands, id_col, max_bucket=max_bucket)
    pairs = estimated_jaccard(pairs, sig, id_col)
    if threshold is not None:
        pairs = pairs.where(F.col("est_jaccard") >= threshold)
    return pairs


def time_band_pairs(
    df: DataFrame,
    ts_col: str,
    band_seconds: int,
    id_col: str = "doc_id",
    equi_cols: list[str] | None = None,
) -> DataFrame:
    """Temporal-band blocking: every pair of records (optionally agreeing
    on ``equi_cols``) whose timestamps lie within ``band_seconds`` of each
    other — the range-join form of blocking every event pipeline needs
    (duplicate-submission detection, retry linkage, near-simultaneous
    sessions) that naive SQL expresses as an O(n²) theta join.

    Returns (equi_cols..., left_id, right_id, delta_sec) with the earlier
    record on the left (ties broken by id), 0 <= delta_sec <= band, each
    qualifying unordered pair exactly once.

    Scale shape: the inequality predicate becomes a dense-integer
    equi-join. Each record gets bucket = floor(epoch/band); the EARLIER
    side replicates to (bucket, bucket+1) — factor exactly 2, independent
    of band or skew — and the later side keeps its own bucket. Any pair
    within the band has the later record in the earlier's bucket or the
    next one, so the equi-join on (equi_cols, bucket) finds every pair
    exactly once (the two exploded buckets are distinct values). Hot time
    windows (a bucket holding b records contributes <= b² candidates) are
    the residual skew; AQE skew-join splits those stragglers, and `band`
    itself is the knob that sizes bucket occupancy. Timestamps reduce to
    whole epoch seconds via unix_timestamp (floor — DuckDB's
    floor(epoch(ts)) matches, so the oracle is engine-exact)."""
    if band_seconds < 1:
        raise ValueError(f"band_seconds must be >= 1, got {band_seconds}")
    equi_cols = list(equi_cols or [])
    base = df.select(
        *equi_cols,
        F.col(id_col),
        F.unix_timestamp(F.col(ts_col)).alias("tb_e"),
    ).where(F.col("tb_e").isNotNull())
    bucket = F.floor(F.col("tb_e") / band_seconds).cast("long")
    lhs = base.select(
        *equi_cols,
        F.col(id_col).alias("left_id"),
        F.col("tb_e").alias("tb_le"),
        F.explode(F.array(bucket, bucket + 1)).alias("tb_b"),
    )
    rhs = base.select(
        *equi_cols,
        F.col(id_col).alias("right_id"),
        F.col("tb_e").alias("tb_re"),
        bucket.alias("tb_b"),
    )
    return (
        lhs.join(rhs, equi_cols + ["tb_b"])
        .where(
            (
                (F.col("tb_re") > F.col("tb_le"))
                | (
                    (F.col("tb_re") == F.col("tb_le"))
                    & (F.col("right_id") > F.col("left_id"))
                )
            )
            & (F.col("tb_re") - F.col("tb_le") <= band_seconds)
        )
        .select(
            *equi_cols,
            "left_id",
            "right_id",
            (F.col("tb_re") - F.col("tb_le")).cast("long").alias("delta_sec"),
        )
    )
