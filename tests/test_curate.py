"""Composed curation funnel (operators/curate.py): planted-disposition
fixture, funnel arithmetic, partition invariance, bench-less mode."""

import pyspark.sql.functions as F
import pytest

from ditto_spark.operators.curate import (
    CurationConfig,
    curate_documents,
    curation_funnel,
)

# Vocabularies are disjoint across groups so no accidental shingle overlap;
# every "good" doc has 30+ words incl. the stopword 'the' (min_stop_hits=1).
_A = ("the alpha beaver canyon delta ember falcon garnet harbor indigo "
      "jasper kelp lumen meadow nectar onyx prairie quartz russet saffron "
      "timber umber velvet willow xenon yonder zephyr anchor bramble cedar")
# near-dup of _A: last 4 words differ → 26-token shared prefix, 24 shared
# 3-gram shingles of 28 each → J = 24/32 = 0.75 ≥ 0.5
_A_ND = " ".join(_A.split()[:26] + ["dune", "echo", "fjord", "grove"])
_B = ("the basil clover dahlia elm fennel ginger hazel iris juniper "
      "laurel mint nutmeg oak pepper rosemary sage thyme urtica vanilla "
      "wasabi yarrow zinnia acorn birch chestnut dogwood elder fig gum")
_C = ("the comet draco eagle fern gale halo ion jade kite lark moth "
      "newt orca pike quail rook swan teal urchin vole wren yak zebu "
      "asp boar crane dove eel")


@pytest.fixture(scope="module")
def fixture_docs(spark):
    rows = [
        (0, _A),                      # kept (cluster representative)
        (2, _A),                      # exact copy of 0 → exact
        (4, _A_ND),                   # near-dup of 0 → near_dup
        (6, "too short text here now"),  # < 20 words → quality
        (8, _B),                      # contaminated (bench doc 1 quotes it)
        (10, _C),                     # kept
    ]
    # bench doc 1 embeds 10 consecutive words of _B → 8 shared shingles ≥ 2
    bench_rows = [
        (1, "unrelated words only " + " ".join(_B.split()[5:15])),
        (3, "totally disjoint benchmark prompt nothing shared at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    return docs, bench


def _dispositions(annotated):
    return {r["doc_id"]: r["dropped_at"] for r in annotated.collect()}


def test_planted_dispositions(fixture_docs):
    docs, bench = fixture_docs
    got = _dispositions(curate_documents(docs, bench=bench))
    assert got == {
        0: "kept",
        2: "exact",
        4: "near_dup",
        6: "quality",
        8: "contaminated",
        10: "kept",
    }


def test_one_row_per_input_doc(fixture_docs):
    docs, bench = fixture_docs
    ann = curate_documents(docs, bench=bench)
    assert ann.count() == docs.count()
    assert ann.select("doc_id").distinct().count() == docs.count()


def test_funnel_arithmetic(fixture_docs):
    docs, bench = fixture_docs
    ann = curate_documents(docs, bench=bench)
    funnel = {r["stage"]: (r["dropped"], r["remaining"])
              for r in curation_funnel(ann).collect()}
    assert funnel == {
        "quality": (1, 5),
        "exact": (1, 4),
        "near_dup": (1, 3),
        "contaminated": (1, 2),
    }


def test_without_bench_no_contaminated_stage(fixture_docs):
    docs, _ = fixture_docs
    got = _dispositions(curate_documents(docs))
    assert got[8] == "kept"  # no benchmark → nothing to contaminate
    assert "contaminated" not in set(got.values())
    # other stages unchanged
    assert got[2] == "exact" and got[4] == "near_dup" and got[6] == "quality"


def test_partition_invariance(fixture_docs):
    docs, bench = fixture_docs
    a = _dispositions(curate_documents(docs, bench=bench))
    b = _dispositions(
        curate_documents(docs.repartition(7), bench=bench.repartition(3))
    )
    assert a == b


def test_kept_texts_are_distinct_and_quality(fixture_docs):
    docs, bench = fixture_docs
    ann = curate_documents(docs, bench=bench)
    kept = docs.join(
        ann.where(F.col("dropped_at") == "kept").select("doc_id"), "doc_id"
    )
    texts = [r["text"] for r in kept.collect()]
    assert len(texts) == len(set(texts))
    assert all(len(t.split()) >= 20 for t in texts)


def test_jaccard_threshold_knob(fixture_docs):
    # raising τ above 0.75 splits the {0, 4} near-dup cluster
    docs, bench = fixture_docs
    got = _dispositions(
        curate_documents(docs, bench=bench, cfg=CurationConfig(jaccard_threshold=0.8))
    )
    assert got[4] == "kept"
    assert got[2] == "exact"  # exact dedup unaffected by τ
