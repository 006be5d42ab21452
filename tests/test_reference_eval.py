"""Protocol parity on the reference's OWN labeled datasets: read its
ER-Magellan pair TSVs, tune τ on its valid split, score its test split,
confusion F1 — the tune-then-test flow of matcher.py:192-253. Floors are
set under measured surrogate values (the LM scorer slot needs torch,
absent here); skipped if the reference data dir is absent."""

import os

import pytest

REF = "/root/reference/data/er_magellan"

CASES = [
    # (dataset, measured surrogate F1, floor with safety margin)
    ("Structured/DBLP-ACM", 0.8875, 0.82),
    ("Structured/Beer", 0.65, 0.55),
    ("Structured/Fodors-Zagats", 0.8571, 0.78),
]


@pytest.mark.parametrize("name,measured,floor", CASES)
def test_reference_dataset_f1_floor(spark, name, measured, floor):
    if not os.path.exists(f"{REF}/{name}/valid.txt"):
        pytest.skip("reference data not available")
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scripts.run_reference_eval import evaluate_dataset

    r = evaluate_dataset(spark, name, use_arrow_udf=False)
    assert r["f1"] >= floor, r
    # strict-> threshold semantics sanity: tau from the ditto grid
    assert 0.0 <= r["tau"] <= 0.95


def test_reference_beer_idf_surrogate_beats_plain(spark):
    """IDF-weighted cosine (Arrow UDF path) on Beer: measured 0.8387 —
    above the reference LM's 0.7928; floor leaves margin."""
    if not os.path.exists(f"{REF}/Structured/Beer/valid.txt"):
        pytest.skip("reference data not available")
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scripts.run_reference_eval import evaluate_dataset

    r = evaluate_dataset(spark, "Structured/Beer", use_arrow_udf=True, use_idf=True)
    assert r["f1"] >= 0.75, r


def test_reference_beer_relational_idf_identical_to_dict(spark):
    """The corpus-scale relational IDF path (token-index join, no driver
    vocabulary collect) must reproduce the closure-dict path's F1/tau
    exactly on a real reference dataset."""
    if not os.path.exists(f"{REF}/Structured/Beer/valid.txt"):
        pytest.skip("reference data not available")
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scripts.run_reference_eval import evaluate_dataset

    rel = evaluate_dataset(spark, "Structured/Beer", idf_mode="relational")
    dct = evaluate_dataset(spark, "Structured/Beer", idf_mode="dict")
    assert rel["f1"] == dct["f1"], (rel, dct)
    assert rel["tau"] == dct["tau"]
    assert (rel["tp"], rel["fp"], rel["fn"]) == (dct["tp"], dct["fp"], dct["fn"])


def test_fs_unsupervised_beats_floor_on_beer(spark):
    """Unsupervised FS (no labels) on the reference's Beer benchmark:
    F1 >= 0.7 — above the measured 0.80 minus slack; the reference's
    fine-tuned LM scores 0.7928 on the same split."""
    import os

    import pytest

    if not os.path.exists(
        "/root/reference/data/er_magellan/Structured/Beer/valid.txt"
    ):
        pytest.skip("reference fixtures unavailable")
    from scripts.run_reference_eval import fs_evaluate_dataset

    r = fs_evaluate_dataset(spark, "Structured/Beer")
    assert r["fs_f1"] >= 0.7, r
