import json

from ditto_spark.sources import (
    read_pairs_tsv,
    read_candidates_jsonl,
    write_matches_jsonl,
    read_matches_jsonl,
    wdc_corpus_to_pairs,
    load_task_registry,
)


def test_pairs_tsv_roundtrip(spark, tmp_path):
    p = tmp_path / "pairs.txt"
    p.write_text(
        "COL title VAL beer a\tCOL title VAL beer b\t1\n"
        'COL title VAL "quoted" x\tCOL title VAL y\t0\n'
    )
    got = read_pairs_tsv(spark, str(p)).orderBy("label").collect()
    assert got[0]["label"] == 0 and got[0]["left_txt"] == 'COL title VAL "quoted" x'
    assert got[1]["label"] == 1 and got[1]["right_txt"] == "COL title VAL beer b"


def test_candidates_jsonl(spark, tmp_path):
    p = tmp_path / "cand.jsonl"
    p.write_text('["left one", "right one"]\n["l2", "r2"]\n')
    got = read_candidates_jsonl(spark, str(p)).orderBy("left_txt").collect()
    assert [(r["left_txt"], r["right_txt"]) for r in got] == [
        ("l2", "r2"), ("left one", "right one"),
    ]


def test_matches_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "b", 1, 0.97), ("c", "d", 0, 0.88)],
        "left_txt string, right_txt string, match int, match_confidence double",
    )
    out = str(tmp_path / "matches")
    write_matches_jsonl(df, out)
    back = read_matches_jsonl(spark, out).orderBy("left").collect()
    assert back[0]["left"] == "a" and back[0]["match"] == 1
    assert abs(back[1]["match_confidence"] - 0.88) < 1e-12


def test_wdc_corpus_to_pairs(spark, tmp_path):
    p = tmp_path / "wdc.jsonl"
    rows = [
        {"title_left": "cam x", "brand_left": "acme", "title_right": "cam y",
         "brand_right": None, "label": 1},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    got = wdc_corpus_to_pairs(spark, str(p)).collect()[0]
    assert got["left_txt"] == "COL brand VAL acme COL title VAL cam x"
    # null attribute skipped (convert.py:13-14)
    assert got["right_txt"] == "COL title VAL cam y"
    assert got["label"] == 1


def test_task_registry(tmp_path):
    p = tmp_path / "configs.json"
    p.write_text(json.dumps([
        {"name": "Structured/Beer", "trainset": "t.txt", "task_type": "classification"},
        {"name": "Dirty/DBLP-ACM", "trainset": "d.txt", "task_type": "classification"},
    ]))
    reg = load_task_registry(str(p))
    assert set(reg) == {"Structured/Beer", "Dirty/DBLP-ACM"}
    assert reg["Structured/Beer"]["trainset"] == "t.txt"
