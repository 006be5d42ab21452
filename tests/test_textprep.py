import pyspark.sql.functions as F
import pytest

from ditto_spark.operators.textprep import (
    token_document_frequency,
    tfidf_summarize,
    normalize_numbers,
    detect_language,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_document_frequency(spark):
    df = _docs(spark, [(1, "a b a"), (2, "b c"), (3, "c c d")])
    got = {r["token"]: r["df_cnt"] for r in token_document_frequency(df).collect()}
    assert got == {"a": 1, "b": 2, "c": 2, "d": 1}


def test_tfidf_summarize_keeps_rarest_in_order(spark):
    # 'common' appears in all docs (df=3), rare tokens df=1
    df = _docs(
        spark,
        [
            (1, "common rare1 common rare2 rare3"),
            (2, "common x1 x2"),
            (3, "common y1"),
        ],
    )
    idx = token_document_frequency(df)
    out = {
        r["doc_id"]: r["summary"]
        for r in tfidf_summarize(df, idx, max_tokens=2).collect()
    }
    # doc1: rarest two by (df asc, token asc) = rare1, rare2; original order kept
    assert out[1] == "rare1 rare2"
    assert out[2] == "x1 x2"
    assert out[3] == "common y1"  # only 2 distinct tokens → both kept


def test_tfidf_summarize_drops_stopwords(spark):
    df = _docs(spark, [(1, "the quick fox the lazy dog")])
    idx = token_document_frequency(df)
    out = tfidf_summarize(df, idx, max_tokens=10).collect()[0]["summary"]
    assert "the" not in out.split()
    assert out == "quick fox lazy dog"


def test_tfidf_summarize_keeps_all_occurrences(spark):
    df = _docs(spark, [(1, "z aa z b z"), (2, "b q")])
    idx = token_document_frequency(df)
    out = {
        r["doc_id"]: r["summary"]
        for r in tfidf_summarize(df, idx, max_tokens=1).collect()
    }
    # doc1 rarest token by (df, token): 'aa' (df=1) — kept; all 'z' dropped
    assert out[1] == "aa"

    df2 = _docs(spark, [(1, "z q z b z"), (2, "b y")])
    idx2 = token_document_frequency(df2)
    out2 = {
        r["doc_id"]: r["summary"]
        for r in tfidf_summarize(df2, idx2, max_tokens=1).collect()
    }
    # doc1 rarest = 'q'... tie df=1 among q,z → 'q' wins (token asc); but if
    # the kept token is 'z' every occurrence must survive in order
    assert out2[1] == "q"


def test_normalize_numbers(spark):
    df = _docs(spark, [(1, "price 007 is 3.14159 for sku12345 and x1")])
    out = normalize_numbers(df).collect()[0]["normalized"]
    # 007→7, 3.14159→3.14, sku12345 (len≥7, has digit)→ID-prefixed, x1 short → kept
    assert out == "price 7 is 3.14 for IDsku12345 and x1"


def test_normalize_numbers_long_digits_not_dropped(spark):
    """A >18-digit integer token must NOT be silently dropped (bigint cast
    nulls/errors under ANSI): it falls through to the ID branch."""
    big = "9" * 25
    df = _docs(spark, [(1, f"serial {big} end"), (2, f"v {'1' * 18} w")])
    out = {r["doc_id"]: r["normalized"] for r in normalize_numbers(df).collect()}
    assert out[1] == f"serial ID{big} end"
    assert out[2] == f"v {'1' * 18} w"  # 18 digits still int-normalized


def test_detect_language(spark):
    df = _docs(
        spark,
        [
            (1, "the cat is in the house and it is warm"),
            (2, "der hund ist nicht mit der katze"),
            (3, "le chat est pour la maison et les oiseaux"),
            (4, "zz qq ww"),
        ],
    )
    out = {r["doc_id"]: r["detected_lang"] for r in detect_language(df).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_dk_inject_general_markers(spark):
    from ditto_spark.operators.textprep import dk_inject

    df = _docs(spark, [(1, "meeting on 1999 at 12:30 cost $5.00 and 3kg of acme stuff")])
    out = dk_inject(
        df, out_col="injected", gazetteer={"ORG": ["acme"]}
    ).collect()[0]["injected"]
    assert "DATE 1999" in out
    assert "TIME 12:30" in out
    assert "MONEY $5.00" in out
    assert "QUANTITY 3kg" in out
    assert "ORG acme" in out
    # unmarked tokens pass through
    assert out.startswith("meeting on DATE 1999")


def test_dk_inject_product_mode_folds_labels(spark):
    from ditto_spark.operators.textprep import dk_inject

    df = _docs(spark, [(1, "apple device 1999 99% off")])
    out = dk_inject(
        df, out_col="injected", mode="product", gazetteer={"ORG": ["apple"]}
    ).collect()[0]["injected"]
    assert "PRODUCT apple" in out
    assert "NUM 1999" in out
    assert "NUM 99%" in out


def test_dk_inject_number_normalization_matches_reference_walk(spark):
    from ditto_spark.operators.textprep import dk_inject

    df = _docs(spark, [(1, "007 3.14159 sku12345 plain")])
    out = dk_inject(df, out_col="injected").collect()[0]["injected"]
    # ints canonicalized, floats %.2f, long digit-bearing tokens get a
    # separate 'ID' marker token (knowledge.py:100-103 'ID ' + token)
    assert out == "7 3.14 ID sku12345 plain"


def test_tfidf_summarize_subword_budget(spark):
    from ditto_spark.operators.textprep import (
        token_document_frequency, tfidf_summarize,
    )

    # doc 1: 'rareword' (df 1, cost ceil(8/4)=2), 'common' (df 2, cost 2),
    # 'tiny' (df 1, cost 1). rarity order: rareword/tiny (df 1, token asc:
    # rareword < tiny) -> budget walks rareword(2), tiny(3), common(5)
    df = _docs(
        spark,
        [(1, "rareword common tiny rareword"), (2, "common filler words")],
    )
    idx = token_document_frequency(df)
    # budget 3: rareword + tiny admitted, common (cum 5) excluded
    out = {
        r["doc_id"]: r["summary"]
        for r in tfidf_summarize(df, idx, max_subwords=3).collect()
    }
    assert out[1] == "rareword tiny rareword"  # original order, all occurrences
    # budget 5: everything fits
    out5 = {
        r["doc_id"]: r["summary"]
        for r in tfidf_summarize(df, idx, max_subwords=5).collect()
    }
    assert out5[1] == "rareword common tiny rareword"


def test_detect_language_widened_set(spark):
    """One sentence per new language (function words only), plus the
    min_hits floor: a single stray stopword is not evidence."""
    samples = {
        5: ("it", "il gatto non sono della casa per questo che"),
        6: ("pt", "não uma para com os mais como isso que"),
        7: ("nl", "het een van niet dat maar zijn voor ik"),
        8: ("sv", "och att det som är på för med inte"),
        9: ("da", "og det at der til ikke jeg med han hvad"),
        10: ("no", "og det ikke som på jeg har av hva"),
        11: ("pl", "nie się jest to czy ale jak tak tego"),
        12: ("ro", "și nu este care din mai pentru sunt dacă"),
        13: ("id", "yang dan di itu dengan untuk tidak ini dari"),
        14: ("tr", "bir ve bu için ne gibi ama değil daha çok"),
    }
    df = _docs(spark, [(i, t) for i, (_, t) in samples.items()])
    out = {r["doc_id"]: r["detected_lang"] for r in detect_language(df).collect()}
    assert out == {i: lang for i, (lang, _) in samples.items()}


def test_detect_language_min_hits_floor(spark):
    df = _docs(spark, [(1, "le fromage artisanal"), (2, "le vin est pour moi")])
    # one French hit ("le"): floor 2 → und; default floor 1 → fr
    strict = {
        r["doc_id"]: r["detected_lang"]
        for r in detect_language(df, min_hits=2).collect()
    }
    assert strict == {1: "und", 2: "fr"}
    loose = {r["doc_id"]: r["detected_lang"] for r in detect_language(df).collect()}
    assert loose == {1: "fr", 2: "fr"}


def test_repetition_stats(spark):
    from ditto_spark.operators.textprep import repetition_stats

    df = _docs(
        spark,
        [
            (1, "a b a b a b"),        # bigrams: ab,ba,ab,ba,ab → top 3/5
            (2, "x y z w"),            # all distinct → top 1/3, dup3 0
            (3, "r r r r r"),          # one bigram repeated 4x, trigram 3x
            (4, "q"),                  # too short for any gram
        ],
    )
    got = {
        r["doc_id"]: (r["top_bigram_frac"], r["dup_trigram_frac"])
        for r in repetition_stats(df).collect()
    }
    assert got[1] == (round(3 / 5, 9), 1.0)  # aba/bab each repeat → all dup
    assert got[2] == (round(1 / 3, 9), 0.0)
    assert got[3] == (1.0, 1.0)
    assert got[4] == (0.0, 0.0)


def test_pii_scrub_counts_and_order(spark):
    from ditto_spark.operators.textprep import pii_scrub

    df = _docs(
        spark,
        [
            (1, "mail a@b.co and b@c.org now"),
            (2, "host 10.1.2.3 ssn 123-45-6789 tel 555-123-4567"),
            (3, "clean text only"),
        ],
    )
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (got[1]["n_email"], got[1]["scrubbed"]) == (
        2, "mail <EMAIL> and <EMAIL> now"
    )
    r2 = got[2]
    # the SSN must be consumed by the ssn pattern, not the phone pattern
    assert (r2["n_ipv4"], r2["n_ssn"], r2["n_phone"]) == (1, 1, 1)
    assert r2["scrubbed"] == "host <IPV4> ssn <SSN> tel <PHONE>"
    assert got[3]["scrubbed"] == "clean text only"
    assert sum(got[3][c] for c in ["n_email", "n_ipv4", "n_ssn", "n_phone"]) == 0


def test_gopher_quality_filter_rules(spark):
    from ditto_spark.operators.textprep import gopher_quality_filter

    df = _docs(
        spark,
        [
            (1, "the cat sat on the mat and then have a nap to rest of it"),
            (2, "too short now"),
            (3, "- item one and the\n- item two of the\n- item three to be"),
            (4, "the ### #### of ## and ## to be ## have ##"),
            (5, "1 2 3 4 5 6 7 8 9 10 11 12"),
            (6, "the end is near...\nof all things to come...\nand that is it"),
            (7, ""),
            (8, "a" * 30 + " " + "b" * 30 + " the of and"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in gopher_quality_filter(df, min_words=5, min_stop_hits=2).collect()
    }
    assert out[1]["keep"] == 1
    assert out[2]["keep"] == 0 and out[2]["n_words"] == 3          # too short
    assert out[3]["keep"] == 0 and out[3]["bullet_frac"] == 1.0    # all bullets
    assert out[4]["keep"] == 0 and out[4]["symbol_ratio"] > 0.1    # symbol heavy
    assert out[5]["keep"] == 0 and out[5]["alpha_word_frac"] == 0.0
    assert out[6]["keep"] == 0                                     # 2/3 ellipsis lines
    assert abs(out[6]["ellipsis_frac"] - 2 / 3) < 1e-6
    assert out[7]["keep"] == 0 and out[7]["n_words"] == 0          # empty, no ANSI error
    assert out[7]["mean_word_len"] == 0.0
    assert out[8]["keep"] == 0 and out[8]["mean_word_len"] > 12    # degenerate words


def test_duplicated_span_stats_known_values(spark):
    from ditto_spark.operators.textprep import duplicated_span_stats

    df = _docs(
        spark,
        [
            (1, "a b c d e f"),
            (2, "x x a b c y z w"),
            (3, "q r s t u v"),
            (4, "a b c d e f"),
            (5, "a b c k k k k a b c"),
            (7, ""),
        ],
    )
    out = {r["doc_id"]: r for r in duplicated_span_stats(df, l=3).collect()}
    assert len(out) == 6
    # exact copies: every position duplicated, one maximal run
    for d in (1, 4):
        r = out[d]
        assert (r["n_tokens"], r["dup_anchor_cnt"], r["n_dup_spans"]) == (6, 4, 1)
        assert r["dup_token_frac"] == 1.0
    # single shared trigram "a b c" at pos 2 covers positions 2..4 of 8
    assert out[2]["n_dup_spans"] == 1 and out[2]["dup_anchor_cnt"] == 1
    assert out[2]["dup_token_frac"] == 0.375
    # no gram shared
    assert out[3]["dup_anchor_cnt"] == 0 and out[3]["dup_token_frac"] == 0.0
    # two disjoint shared runs separated by a gap stay two maximal spans
    assert out[5]["n_dup_spans"] == 2 and out[5]["dup_anchor_cnt"] == 2
    assert out[5]["dup_token_frac"] == 0.6
    # empty document: zero everything, no ANSI division error
    assert out[7]["n_tokens"] == 0 and out[7]["dup_token_frac"] == 0.0


def test_duplicated_span_stats_partition_invariant(spark):
    from ditto_spark.operators.textprep import duplicated_span_stats

    df = _docs(
        spark,
        [(i, "common phrase here now " + ("w%d x y z " % i) * 3) for i in range(12)],
    )
    a = sorted(map(tuple, duplicated_span_stats(df, l=4).collect()))
    b = sorted(map(tuple, duplicated_span_stats(df.repartition(5), l=4).collect()))
    assert a == b


def test_ngram_lm_score_matches_independent_python(spark):
    import math as _math

    from ditto_spark.operators.textprep import ngram_lm_score

    train_rows = [(0, "a b a b a c"), (2, "a b c d")]
    score_rows = [(0, "a b a b a c"), (1, "z z z"), (3, "x")]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    score = spark.createDataFrame(score_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in ngram_lm_score(train, score, alpha=0.1).collect()
    }
    assert 3 not in got  # single-token doc has no bigram

    # independent python
    cb, cu, vocab = {}, {}, set()
    for _, t in train_rows:
        toks = t.split(" ")
        vocab.update(toks)
        for w1, w2 in zip(toks, toks[1:]):
            cb[(w1, w2)] = cb.get((w1, w2), 0) + 1
            cu[w1] = cu.get(w1, 0) + 1
    V = len(vocab)
    for doc_id, t in score_rows:
        toks = t.split(" ")
        if len(toks) < 2:
            continue
        bits = [
            -_math.log2(
                (cb.get((w1, w2), 0) + 0.1) / (cu.get(w1, 0) + 0.1 * V)
            )
            for w1, w2 in zip(toks, toks[1:])
        ]
        avg = sum(bits) / len(bits)
        assert got[doc_id]["n_bigrams"] == len(bits)
        assert got[doc_id]["bits_per_token"] == pytest.approx(avg, abs=1e-6)
        assert got[doc_id]["perplexity"] == pytest.approx(2**avg, abs=1e-3)

    # in-domain text scores lower perplexity than OOV text
    assert got[0]["perplexity"] < got[1]["perplexity"]


def test_ngram_lm_score_ignores_empty_tokens(spark):
    from ditto_spark.operators.textprep import ngram_lm_score

    clean = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    dirty = spark.createDataFrame([(0, " a  b   c ")], "doc_id long, text string")
    r_clean = ngram_lm_score(clean, clean).collect()[0]
    r_dirty = ngram_lm_score(dirty, dirty).collect()[0]
    assert r_clean["n_bigrams"] == r_dirty["n_bigrams"] == 2
    assert r_clean["bits_per_token"] == r_dirty["bits_per_token"]


def test_bpe_token_stats_pattern(spark):
    """GPT-2-ish pre-tokenizer counts: contractions split, punctuation runs
    grouped, space-prefixed words single tokens."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod_bpe", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [
            (1, "it's here"),     # it + 's + ' here' -> 3
            (2, "hello, world!"), # hello + ',' + ' world' + '!' -> 4
            (3, "a1b2"),          # a + 1 + b + 2 -> 4
            (4, ""),              # 0
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id",
            F.size(
                F.expr(f'regexp_extract_all(text, "{m._BPE_PATTERN}", 0)')
            ).alias("n"),
        ).collect()
    }
    assert out == {1: 3, 2: 4, 3: 4, 4: 0}


def test_fold_accents_canonical_and_multichar(spark):
    from ditto_spark.operators.textprep import fold_accents_expr

    df = spark.createDataFrame(
        [("crème brûlée",), ("josé müller",), ("łódź straße",), ("ĳs æon œuf",),
         ("plain ascii",), (None,)],
        "s string",
    )
    got = [r["f"] for r in df.select(fold_accents_expr(F.col("s")).alias("f")).collect()]
    assert got == [
        "creme brulee", "jose muller", "lodz strasse", "ijs aeon oeuf",
        "plain ascii", None,
    ]


def test_fold_accents_spark_duckdb_parity(spark):
    """The generated SQL and the Spark expression agree char-for-char on
    every mapped character — parity by construction, asserted anyway."""
    import duckdb

    from ditto_spark.operators.textprep import (
        ACCENT_FOLD_1TO1,
        ACCENT_FOLD_MULTI,
        fold_accents_expr,
        fold_accents_sql,
    )

    s = "".join(ACCENT_FOLD_1TO1) + "".join(ACCENT_FOLD_MULTI) + " abc-123"
    spark_out = (
        spark.createDataFrame([(s,)], "s string")
        .select(fold_accents_expr(F.col("s")).alias("f"))
        .collect()[0]["f"]
    )
    duck_out = duckdb.sql(
        "select " + fold_accents_sql("'" + s.replace("'", "''") + "'")
    ).fetchone()[0]
    assert spark_out == duck_out


def test_fold_accents_idempotent(spark):
    from ditto_spark.operators.textprep import ACCENT_FOLD_1TO1, fold_accents_expr

    s = "".join(ACCENT_FOLD_1TO1)
    once = (
        spark.createDataFrame([(s,)], "s string")
        .select(fold_accents_expr(F.col("s")).alias("f"))
        .collect()[0]["f"]
    )
    twice = (
        spark.createDataFrame([(once,)], "s string")
        .select(fold_accents_expr(F.col("s")).alias("f"))
        .collect()[0]["f"]
    )
    assert once == twice and once.isascii()


def test_chunk_exact_dedup_drops_repeated_spans(spark):
    """A boilerplate window shared by three docs survives once (in the
    smallest doc_id); a doc that is entirely earlier-seen windows comes
    back empty; unique windows are untouched."""
    from ditto_spark.operators.textprep import chunk_exact_dedup

    boiler = " ".join(f"b{i}" for i in range(4))          # one 4-token chunk
    uniq = lambda d: " ".join(f"u{d}x{i}" for i in range(4))  # noqa: E731
    rows = [
        (0, boiler + " " + uniq(0)),   # keeps boiler + own tail
        (1, boiler + " " + uniq(1)),   # boiler dropped
        (2, boiler),                   # fully dropped -> empty
        (3, uniq(3)),                  # untouched
    ]
    out = {
        r["doc_id"]: r
        for r in chunk_exact_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"),
            chunk_tokens=4,
        ).collect()
    }
    assert out[0]["dedup_text"] == boiler + " " + uniq(0)
    assert out[0]["n_chunks"] == 2 and out[0]["n_kept"] == 2
    assert out[1]["dedup_text"] == uniq(1)
    assert out[1]["n_kept"] == 1
    assert out[2]["dedup_text"] == "" and out[2]["n_kept"] == 0
    assert out[3]["dedup_text"] == uniq(3) and out[3]["n_kept"] == 1


def test_chunk_exact_dedup_partial_tail_window(spark):
    """The final short window is its own chunk; identical tails dedup."""
    from ditto_spark.operators.textprep import chunk_exact_dedup

    rows = [(0, "a b c d e f"), (1, "z y x w e f")]  # shared tail "e f"
    out = {
        r["doc_id"]: r
        for r in chunk_exact_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"),
            chunk_tokens=4,
        ).collect()
    }
    assert out[0]["dedup_text"] == "a b c d e f"
    assert out[1]["dedup_text"] == "z y x w"
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 1


def test_chunk_exact_dedup_release_cache(spark):
    """Round-4 advice: the persisted token table must be releasable — after
    the consuming action + release_chunk_cache, no persistent RDDs remain
    (long-lived sessions otherwise accumulate cached token arrays)."""
    from ditto_spark.operators.textprep import chunk_exact_dedup, release_chunk_cache

    def rdd_ids():
        return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())

    # delta-based: earlier tests in a shared session may hold
    # localCheckpoint RDDs that clearCache does not (and should not) touch
    before = rdd_ids()
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(40))) for i in range(20)],
        "doc_id long, text string",
    )
    out = chunk_exact_dedup(docs, chunk_tokens=8)
    assert out.count() == 20
    assert rdd_ids() - before, "persist_toks=True must cache the token table"
    release_chunk_cache(out)
    assert rdd_ids() - before == set(), "release must drop the operator's cache"
    # a persist_toks=False run never caches and release is a no-op
    out2 = chunk_exact_dedup(docs, chunk_tokens=8, persist_toks=False)
    assert out2.count() == 20
    release_chunk_cache(out2)
    assert rdd_ids() - before == set()
