"""Metric parity tests.

VQA normalization/accuracy are cross-checked against the reference's vendored
official eval (imported read-only from /root/reference — pure stdlib, runs
as-is).  CIDEr/OK-VQA are checked on hand-constructed cases (their reference
deps — pycocoevalcap/Java, nltk corpora, inflection — are absent here).
"""

import json
import sys
from pathlib import Path

import pytest

from licv_vqa_tpu.metrics import (
    compute_cider,
    compute_vqa_accuracy,
    normalize_vqa_answer,
    postprocess_ok_vqa_generation,
    postprocess_vqa_generation,
)
from licv_vqa_tpu.metrics.cider import cider_d
from licv_vqa_tpu.metrics.nlp import singularize
from licv_vqa_tpu.metrics.okvqa_stem import OKVQAStemmer

REFERENCE = Path("/root/reference")


@pytest.fixture(scope="module")
def ref_vqa_eval():
    sys.path.insert(0, str(REFERENCE / "icv_src" / "metrics"))
    try:
        import vqa_metric as ref

        return ref.VQAEval(None, None)
    finally:
        sys.path.pop(0)


CASES = [
    "A dog, sitting on the mat.",
    "it's twenty-two",
    "no;maybe? yes!",
    "1,000 dollars",
    "the (red) ball",
    "couldnt say",
    "didnt    work\nnew line\ttab",
    "none",
    "2",
    "an apple a day",
    "don't know",
    "isnt it 1.5",
]


@pytest.mark.parametrize("text", CASES)
def test_normalization_matches_official_eval(ref_vqa_eval, text):
    cleaned = text.replace("\n", " ").replace("\t", " ").strip()
    want = ref_vqa_eval.processDigitArticle(ref_vqa_eval.processPunctuation(cleaned))
    got = normalize_vqa_answer(text)
    assert got == want


def _fixture_files(tmp_path, preds):
    questions = {"questions": []}
    annotations = {"annotations": []}
    for i, (pred, answers, expect) in enumerate(preds):
        qid = 10 + i
        questions["questions"].append(
            {"question_id": qid, "image_id": i, "question": "?"}
        )
        annotations["annotations"].append(
            {
                "question_id": qid,
                "image_id": i,
                "question_type": "what",
                "answer_type": "other",
                "multiple_choice_answer": answers[0],
                "answers": [
                    {"answer": a, "answer_id": j + 1}
                    for j, a in enumerate(answers)
                ],
            }
        )
    qp, ap = tmp_path / "q.json", tmp_path / "a.json"
    qp.write_text(json.dumps(questions))
    ap.write_text(json.dumps(annotations))
    results = [
        {"answer": pred, "question_id": 10 + i}
        for i, (pred, _, _) in enumerate(preds)
    ]
    return results, str(qp), str(ap)


def test_consensus_accuracy_values(tmp_path):
    # 10 annotators; acc = mean over leave-one-out of min(matches/3, 1)
    preds = [
        ("cat", ["cat"] * 10, 100.0),  # all match
        ("cat", ["cat"] * 3 + ["dog"] * 7, None),  # 3 matches
        ("bird", ["cat"] * 10, 0.0),
    ]
    results, qp, ap = _fixture_files(tmp_path, preds)
    acc = compute_vqa_accuracy(results, qp, ap)
    per_q = acc["perQuestion"]
    assert per_q[10] == 100.0
    # 3 matching annotators: leave-one-out → 3×(2/3) + 7×(3/3→1) = (3*2/3 + 7*1)/10
    want = round(100 * (3 * (2 / 3) + 7 * 1.0) / 10, 2)
    assert per_q[11] == want
    assert per_q[12] == 0.0
    assert acc["overall"] == round((100.0 + want + 0.0) / 3, 2)
    assert "what" in acc["perQuestionType"]


def test_vqa_postprocess_split_rules():
    assert postprocess_vqa_generation("blue Question: what") == "blue "
    assert postprocess_vqa_generation("red, green and blue") == "red"
    assert postprocess_vqa_generation("42 Short answer") == "42 "


def test_okvqa_stemmer_manual_and_rules():
    st = OKVQAStemmer()
    assert st.stem("police") == "police"  # manual identity
    assert st.stem("leaves") == "leaf"  # manual
    assert st.stem("riding") == "ride"  # manual
    assert st.stem("dogs") == "dog"  # plural rule
    assert st.stem("running") == "run"  # -ing rule
    assert postprocess_ok_vqa_generation("gloves, maybe") == "glove"


def test_singularize_rules():
    assert singularize("boxes") == "box"
    assert singularize("cities") == "city"
    assert singularize("wolves") == "wolf"
    assert singularize("buses") == "bus"
    assert singularize("men") == "man"
    assert singularize("fish") == "fish"
    assert singularize("glass") == "glass"


def test_cider_perfect_and_disjoint(tmp_path):
    refs = {
        1: ["a dog runs in the park", "the dog is running"],
        2: ["two cats sleep on a couch", "cats sleeping together"],
    }
    # perfect hypothesis scores far above a disjoint one
    hyps_good = {1: "a dog runs in the park", 2: "two cats sleep on a couch"}
    hyps_bad = {1: "purple elephants fly", 2: "quantum physics lecture"}
    good, per = cider_d(hyps_good, refs)
    bad, _ = cider_d(hyps_bad, refs)
    assert good > 3.0  # near-max (10 scaled, averaged over 2 refs)
    assert bad == 0.0
    assert set(per) == {1, 2}


def test_compute_cider_file_contract(tmp_path):
    ann = {
        "images": [{"id": 1, "file_name": "x.jpg"}, {"id": 2, "file_name": "y.jpg"}],
        "annotations": [
            {"image_id": 1, "caption": "a red ball", "id": 1},
            {"image_id": 1, "caption": "the red ball bounces", "id": 2},
            {"image_id": 2, "caption": "a blue car drives", "id": 3},
            {"image_id": 2, "caption": "the blue car is fast", "id": 4},
        ],
    }
    p = tmp_path / "captions.json"
    p.write_text(json.dumps(ann))
    score = compute_cider(
        [
            {"image_id": 1, "caption": "a red ball"},
            {"image_id": 2, "caption": "a blue car drives"},
        ],
        str(p),
    )
    assert score > 0


def test_native_scorer_matches_python(tmp_path):
    from licv_vqa_tpu.metrics.native import (
        consensus_native,
        normalize_answer_native,
    )

    if normalize_answer_native("x") is None:
        pytest.skip("native scorer unavailable (no g++?)")

    import random

    random.seed(0)
    words = ["a", "the", "cat", "two", "2", "don't", "couldnt", "no;", "1,000",
             "ball.", "(red)", "it's", "dog", "yes!", "maybe?"]
    for _ in range(200):
        s = " ".join(random.choices(words, k=random.randint(1, 6)))
        assert normalize_answer_native(s) == normalize_vqa_answer(s), repr(s)

    preds = [
        ("cat", ["cat"] * 10),
        ("Cat.", ["cat"] * 5 + ["dog"] * 5),
        ("two", ["2"] * 4 + ["three"] * 6),
        ("a dog", ["dog"] * 10),
    ]
    got = consensus_native([p for p, _ in preds], [g for _, g in preds])
    from licv_vqa_tpu.metrics.vqa_accuracy import _consensus_accuracy

    for (p, gts), acc in zip(preds, got):
        want = _consensus_accuracy(
            normalize_vqa_answer(p), [normalize_vqa_answer(g) for g in gts]
        )
        assert acc == pytest.approx(want, abs=1e-9)


def test_compute_vqa_accuracy_native_equals_python(tmp_path):
    preds = [
        ("cat", ["cat"] * 10, None),
        ("The dog.", ["dog"] * 3 + ["cat"] * 7, None),
        ("2", ["two"] * 10, None),
    ]
    results, qp, ap = _fixture_files(tmp_path, preds)
    a_native = compute_vqa_accuracy(results, qp, ap, use_native=True)
    a_python = compute_vqa_accuracy(results, qp, ap, use_native=False)
    assert a_native == a_python
