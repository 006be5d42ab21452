"""Soundex: canonical codes, builtin agreement, degenerate inputs."""

import pyspark.sql.functions as F

from ditto_spark.operators.phonetic import soundex_key

CANONICAL = {
    "Robert": "R163",
    "Rupert": "R163",
    "Ashcraft": "A261",  # h/w collapse rule
    "Ashcroft": "A261",
    "Tymczak": "T522",  # vowel separates equal codes
    "Pfister": "P236",  # first letter's code run dropped
    "Honeyman": "H555",
    "Wheeler": "W460",  # h/w-initial keeps following codes
    "Euler": "E460",  # vowel-initial keeps first consonant code
    "Lloyd": "L300",
    "O'Brien": "O165",  # non-letters stripped
    "a": "A000",
}


def test_soundex_canonical_codes(spark):
    df = spark.createDataFrame([(n,) for n in CANONICAL], "name string")
    got = {
        r["name"]: r["sx"]
        for r in df.select("name", soundex_key(F.col("name")).alias("sx")).collect()
    }
    assert got == CANONICAL


def test_soundex_no_letters_is_null(spark):
    df = spark.createDataFrame([("123",), ("  ",), ("",), (None,)], "name string")
    got = [r["sx"] for r in df.select(soundex_key(F.col("name")).alias("sx")).collect()]
    assert got == [None] * 4


def test_soundex_agrees_with_spark_builtin_on_words(spark):
    """Pin parity with Spark's builtin soundex on real corpus words (the
    builtin passes non-alphabetic inputs through; ours nulls them — filtered
    here)."""
    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    words = part.select(
        F.explode(F.split("p_name", " ")).alias("w")
    ).where(F.col("w").rlike("^[A-Za-z]+$")).distinct()
    diff = (
        words.select(
            "w",
            soundex_key(F.col("w")).alias("ours"),
            F.soundex(F.upper("w")).alias("builtin"),
        )
        .where(F.col("ours") != F.col("builtin"))
        .count()
    )
    assert diff == 0


def test_soundex_zero_exchange_plan(spark):
    df = spark.createDataFrame([("Robert",)], "name string")
    plan = (
        df.select(soundex_key(F.col("name")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_jaro_winkler_canonical_values(spark):
    from ditto_spark.operators.phonetic import jaro_winkler_udf

    cases = [
        ("martha", "marhta", 0.9611111111),
        ("dixon", "dicksonx", 0.8133333333),
        ("jellyfish", "smellyfish", 0.8962962963),  # jaro <= 0.7? no: no boost (prefix 0)
        ("duane", "dwayne", 0.84),
        ("crate", "trace", 0.7333333333),  # jaro > 0.7 but prefix 0
        ("ab", "ba", 0.0),  # match window 0
        ("abc", "abc", 1.0),
        ("abc", "", 0.0),
    ]
    df = spark.createDataFrame(cases, "a string, b string, expect double")
    jw = jaro_winkler_udf()
    import pyspark.sql.functions as F

    rows = df.select("a", "b", "expect", jw(F.col("a"), F.col("b")).alias("got")).collect()
    for r in rows:
        assert abs(r["got"] - r["expect"]) < 1e-9, (r["a"], r["b"], r["got"])


def test_jaro_winkler_nulls_propagate(spark):
    from ditto_spark.operators.phonetic import jaro_winkler_udf
    import pyspark.sql.functions as F

    df = spark.createDataFrame([("a", None), (None, "b"), ("x", "x")], "a string, b string")
    jw = jaro_winkler_udf()
    got = [r["j"] for r in df.select(jw(F.col("a"), F.col("b")).alias("j")).collect()]
    assert got[0] is None and got[1] is None and got[2] == 1.0


def test_monge_elkan_matches_hand_computation(spark):
    """ME vs a driver-side reimplementation using DuckDB's builtin JW (which
    test_jaro_winkler_canonical_values pins as bit-identical to our UDF)."""
    import duckdb

    from ditto_spark.operators.phonetic import monge_elkan_scores

    pairs = [
        ("p1", "jonathan q smith", "smith jonathon"),
        ("p2", "margaret thatcher", "thatcher m"),
        ("p3", "abc", "abc"),
    ]
    df = spark.createDataFrame(pairs, "pid string, a string, b string")
    got = {
        r["pid"]: r["monge_elkan"]
        for r in monge_elkan_scores(df, "a", "b", ["pid"]).collect()
    }

    con = duckdb.connect()

    def jw(x, y):
        return con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [x, y]
        ).fetchone()[0]

    def me_dir(ta, tb):
        return sum(max(jw(a, b) for b in tb) for a in ta) / len(ta)

    for pid, a, b in pairs:
        ta, tb = a.split(" "), b.split(" ")
        expect = (me_dir(ta, tb) + me_dir(tb, ta)) / 2
        assert abs(got[pid] - expect) < 1e-9, pid

    assert got["p3"] == 1.0


def test_monge_elkan_single_token_equals_jw(spark):
    """On single-token strings ME degenerates to plain Jaro-Winkler."""
    import pyspark.sql.functions as F

    from ditto_spark.operators.phonetic import (
        jaro_winkler_udf,
        monge_elkan_scores,
    )

    df = spark.createDataFrame(
        [("x", "martha", "marhta"), ("y", "dixon", "dicksonx")],
        "pid string, a string, b string",
    )
    me = {
        r["pid"]: r["monge_elkan"]
        for r in monge_elkan_scores(df, "a", "b", ["pid"]).collect()
    }
    jwf = jaro_winkler_udf()
    jw = {
        r["pid"]: r["j"]
        for r in df.select("pid", jwf(F.col("a"), F.col("b")).alias("j")).collect()
    }
    for pid in me:
        assert abs(me[pid] - jw[pid]) < 1e-12


def test_monge_elkan_symmetric_order_invariant(spark):
    from ditto_spark.operators.phonetic import monge_elkan_scores

    df = spark.createDataFrame(
        [("p", "jonathan q smith", "smith jonathon")], "pid string, a string, b string"
    )
    fwd = monge_elkan_scores(df, "a", "b", ["pid"]).collect()[0]["monge_elkan"]
    rev = monge_elkan_scores(df, "b", "a", ["pid"]).collect()[0]["monge_elkan"]
    assert abs(fwd - rev) < 1e-12


def _py_jaro(s1, s2):
    if s1 == s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    mw = max(len(s1), len(s2)) // 2 - 1
    m1 = [False] * len(s1)
    m2 = [False] * len(s2)
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - mw), min(len(s2), i + mw + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len(s1)):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / len(s1) + matches / len(s2) + (matches - t) / matches) / 3


def _py_jw(s1, s2, p=0.1, gate=0.7):
    j = _py_jaro(s1, s2)
    if j <= gate:
        return j
    pre = 0
    for a, b in zip(s1, s2):
        if a != b or pre == 4:
            break
        pre += 1
    return j + pre * p * (1 - j)


def _py_soft_tfidf(t1, t2, idf, theta=0.9):
    import math as m

    def vec(toks):
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        w = {t: m.log(c + 1.0) * idf[t] for t, c in tf.items()}
        nrm = m.sqrt(sum(x * x for x in w.values()))
        return {t: x / nrm for t, x in w.items()}

    va, vb = vec(t1), vec(t2)
    total = 0.0
    for at, av in va.items():
        best = max(
            ((_py_jw(at, bt), bt) for bt in vb), key=lambda x: (x[0], x[1])
        )
        if best[0] > theta:
            total += av * vb[best[1]] * best[0]
    return total


def test_soft_tfidf_matches_python_reference(spark):
    """Operator ≡ from-scratch Python soft-TF-IDF (textbook JW inner,
    log(tf+1)·idf weights, L2 norms, θ-gate, argmax ties → higher token)."""
    from ditto_spark.operators.phonetic import soft_tfidf_scores

    idf = {
        "smith": 2.0, "smiths": 2.1, "john": 1.0, "the": 0.1,
        "baker": 1.8, "contractor": 1.5,
    }
    rows = [
        (1, "john smith the", "john smiths the"),     # soft surname match
        (2, "john smith", "baker contractor"),        # nothing close -> 0
        (3, "the the john", "john the"),              # tf>1 on one side
    ]
    pairs = spark.createDataFrame(rows, "pid int, l string, r string")
    idf_df = spark.createDataFrame(
        list(idf.items()), "token string, idf double"
    )
    got = {
        r["pid"]: r["soft_tfidf"]
        for r in soft_tfidf_scores(
            pairs, "l", "r", ["pid"], idf_df, theta=0.9
        ).collect()
    }
    for pid, l, r in rows:
        want = _py_soft_tfidf(l.split(), r.split(), idf)
        assert abs(got[pid] - want) < 1e-9, f"pair {pid}: {got[pid]} vs {want}"
    assert got[2] == 0.0
    # identical strings score exactly 1 (cosine of identical unit vectors)
    ident = spark.createDataFrame(
        [(9, "john smith", "john smith")], "pid int, l string, r string"
    )
    one = soft_tfidf_scores(ident, "l", "r", ["pid"], idf_df).collect()[0]
    assert abs(one["soft_tfidf"] - 1.0) < 1e-12
    # theta gates: at theta=0.99 the smith/smiths bridge disappears
    strict = {
        r["pid"]: r["soft_tfidf"]
        for r in soft_tfidf_scores(
            pairs, "l", "r", ["pid"], idf_df, theta=0.99
        ).collect()
    }
    assert strict[1] < got[1]
