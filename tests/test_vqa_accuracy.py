"""Official VQA accuracy, computed locally (eval/vqa_accuracy.py).

The reference only writes result JSONs for the remote eval server
(Ours_SS/...lua:1171-1186); these tests pin the native scorer: the
10-rater consensus math, the official normalization pipeline, its
skip-when-unanimous quirk, and the CLI surface.
"""

import json

import pytest

from rau_vqa_tpu.eval.vqa_accuracy import (
    evaluate,
    normalize_answer,
    process_punctuation,
)


def _ann(qid, answers, qtype="what is", atype="other"):
    """One official-format annotation row; rater rows get distinct ids."""
    return {
        "question_id": qid, "image_id": qid, "question_type": qtype,
        "answer_type": atype, "multiple_choice_answer": answers[0],
        "answers": [{"answer": a, "answer_confidence": "yes",
                     "answer_id": i + 1} for i, a in enumerate(answers)],
    }


def test_normalization_pipeline():
    assert normalize_answer("Two") == "2"
    assert normalize_answer("none") == "0"
    assert normalize_answer("a black dog.") == "black dog"
    assert normalize_answer("black/white") == "black white"   # embedded
    assert normalize_answer("yes !") == "yes"                 # space-adjacent
    assert normalize_answer("1,000") == "1000"
    assert normalize_answer("1.5") == "1.5"                   # decimal kept
    assert normalize_answer("a.m.") == "am"
    assert normalize_answer("dont know") == "don't know"
    assert normalize_answer("  The Cat\n") == "cat"


def test_punctuation_space_rule():
    # a mark that abuts a space is deleted; an embedded one becomes a space
    assert process_punctuation("left - hand") == "left  hand"
    assert process_punctuation("left-hand") == "left hand"


def test_consensus_math():
    # 2 raters say yes, 8 say no.  res='yes': a held-out 'yes' row leaves
    # 1 match (1/3); a held-out 'no' row leaves 2 (2/3) ->
    # (2*(1/3) + 8*(2/3))/10 = 60%
    ann = {"annotations": [_ann(1, ["yes"] * 2 + ["no"] * 8,
                                atype="yes/no")]}
    rep = evaluate([{"question_id": 1, "answer": "yes"}], ann)
    assert rep["overall"] == pytest.approx(60.0)
    assert rep["per_answer_type"] == {"yes/no": 60.0}
    # res='no': held-out 'no' -> 7 matches (cap 1); held-out 'yes' -> 8
    rep = evaluate([{"question_id": 1, "answer": "no"}], ann)
    assert rep["overall"] == pytest.approx(100.0)


def test_unanimous_skips_normalization():
    # the official quirk: when all 10 raters agree, answers are compared
    # RAW (no contraction repair) — pin both directions
    ann = {"annotations": [_ann(2, ["dont know"] * 10)]}
    assert evaluate([{"question_id": 2, "answer": "don't know"}],
                    ann)["overall"] == 0.0
    assert evaluate([{"question_id": 2, "answer": "dont know"}],
                    ann)["overall"] == 100.0
    # with disagreement the same pair scores via normalization
    ann = {"annotations": [_ann(3, ["dont know"] * 9 + ["no"])]}
    rep = evaluate([{"question_id": 3, "answer": "don't know"}], ann)
    assert rep["overall"] > 0.0


def test_duplicate_full_rows_follow_official_row_equality():
    """10 IDENTICAL rater rows (same answer_id): the official leave-one-out
    removes rows by full-dict equality, so every comparison set is empty
    and even a perfect match scores 0 — the exact-loop fallback must
    reproduce that, not the distinct-row fast path."""
    ann = {"annotations": [{
        "question_id": 7, "question_type": "q", "answer_type": "other",
        "multiple_choice_answer": "yes",
        "answers": [{"answer": "yes", "answer_confidence": "yes",
                     "answer_id": 1}] * 10}]}
    assert evaluate([{"question_id": 7, "answer": "yes"}],
                    ann)["overall"] == 0.0


def test_fast_path_matches_exact_loop():
    """With distinct rater rows (real annotations: unique answer_ids) the
    Counter fast path must equal the official exact loop."""
    import random

    from rau_vqa_tpu.eval.vqa_accuracy import _consensus_accuracy

    rng = random.Random(0)
    pool = ["yes", "no", "2", "red"]
    for trial in range(20):
        answers = [rng.choice(pool) for _ in range(10)]
        rows = [{"answer": a, "answer_id": i + 1}
                for i, a in enumerate(answers)]
        res = rng.choice(pool)
        exact = _consensus_accuracy(res, rows)
        got = evaluate([{"question_id": 1, "answer": res}],
                       {"annotations": [_ann(1, answers)]},
                       precision=9)["overall"] / 100.0
        assert got == pytest.approx(exact), (answers, res)


def test_report_shape_missing_and_types():
    ann = {"annotations": [
        _ann(1, ["yes"] * 10, qtype="is the", atype="yes/no"),
        _ann(2, ["2"] * 10, qtype="how many", atype="number"),
    ]}
    rows = [{"question_id": 1, "answer": "yes"},
            {"question_id": 2, "answer": "3"},
            {"question_id": 99, "answer": "unscored"}]
    rep = evaluate(rows, ann)
    assert rep["overall"] == pytest.approx(50.0)
    assert rep["n"] == 2 and rep["missing"] == 1
    assert rep["per_question_type"] == {"how many": 0.0, "is the": 100.0}
    assert rep["per_answer_type"] == {"number": 0.0, "yes/no": 100.0}
    with pytest.raises(ValueError):
        evaluate([{"question_id": 99, "answer": "x"}], ann)
    # question_ids restriction drops qid 2 entirely
    rep = evaluate(rows, ann, question_ids=[1])
    assert rep["overall"] == 100.0 and rep["n"] == 1 and rep["missing"] == 0


def test_cli_vqa_accuracy(tmp_path, capsys):
    from rau_vqa_tpu.cli import main

    res_p = tmp_path / "results.json"
    ann_p = tmp_path / "ann.json"
    rep_p = tmp_path / "report.json"
    res_p.write_text(json.dumps([{"question_id": 1, "answer": "yes"}]))
    ann_p.write_text(json.dumps(
        {"annotations": [_ann(1, ["yes"] * 10, atype="yes/no")]}))
    assert main(["vqa-accuracy", "--results", str(res_p),
                 "--annotations", str(ann_p), "--out", str(rep_p)]) == 0
    out = capsys.readouterr().out
    assert "overall: 100.00" in out
    assert json.loads(rep_p.read_text())["overall"] == 100.0
