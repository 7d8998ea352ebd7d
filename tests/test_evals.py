"""Official metric engines: GQAEval + VQA official evaluator.

The VQA normalization/accuracy tests cross-check against the reference
implementation imported directly from /root/reference (read-only), when
available - guaranteeing behavioral parity of the port.
"""
import json
import os
import sys

import numpy as np
import pytest

from xggm_tpu.evals.gqa_eval import GQAEval, ood_test_report
from xggm_tpu.evals.vqa_eval import (
    VQAOfficialEval, normalize_answer,
)

REF = os.environ.get("XGGM_REFERENCE_PATH", "/root/reference")


def make_gqa_questions(tmp, n=20, seed=0):
    rng = np.random.RandomState(seed)
    questions = {}
    answers = ["yes", "no", "red", "blue"]
    for i in range(n):
        qid = f"q{i}"
        structural = "query" if i % 2 else "verify"
        questions[qid] = {
            "answer": answers[i % 4],
            "isBalanced": True,
            "question": "what is it ?",
            "types": {"structural": structural, "semantic": "attr",
                      "detailed": "x"},
            "groups": {"global": "color"},
            "semantic": [{"operation": "select", "argument": "thing"},
                         {"operation": "query: name", "argument": ""}],
            "ans_head": ["yes", "no"],
            "ans_tail": ["red"],
        }
    return questions


def test_gqa_eval_accuracy(tmp_path):
    questions = make_gqa_questions(tmp_path)
    qfile = tmp_path / "questions.json"
    qfile.write_text(json.dumps(questions))

    # all-correct predictions
    preds = [{"questionId": q, "prediction": v["answer"]}
             for q, v in questions.items()]
    pfile = tmp_path / "preds.json"
    pfile.write_text(json.dumps(preds))
    ev = GQAEval(str(pfile), str(qfile), eval_head_tail=True)
    res = ev.get_acc_result()
    assert res["accuracy"] == pytest.approx(100.0)
    assert res["binary"] == pytest.approx(100.0)
    assert res["open"] == pytest.approx(100.0)
    assert ev.scores["distribution"] == pytest.approx(0.0)

    # half-wrong open questions
    preds2 = []
    for q, v in questions.items():
        ans = v["answer"]
        if v["types"]["structural"] == "query":
            ans = "wrong"
        preds2.append({"questionId": q, "prediction": ans})
    (tmp_path / "preds2.json").write_text(json.dumps(preds2))
    ev2 = GQAEval(str(tmp_path / "preds2.json"), str(qfile))
    res2 = ev2.get_acc_result()
    assert res2["binary"] == pytest.approx(100.0)
    assert res2["open"] == pytest.approx(0.0)
    assert res2["accuracy"] == pytest.approx(50.0)
    lines, detail = ev2.get_str_result()
    assert any("Accuracy: 50.00%" in ln for ln in lines)


def test_gqa_ood_delta(tmp_path):
    questions = make_gqa_questions(tmp_path)
    for name in ("ood_testdev_tail.json", "ood_testdev_head.json",
                 "ood_testdev_all.json"):
        (tmp_path / name).write_text(json.dumps(questions))
    preds = [{"questionId": q, "prediction": v["answer"]}
             for q, v in questions.items()]
    (tmp_path / "p.json").write_text(json.dumps(preds))
    rep = ood_test_report(str(tmp_path / "p.json"), str(tmp_path))
    assert rep["All"] == pytest.approx(100.0)
    assert rep["Delta"] == pytest.approx(0.0)


def _make_vqa_fixture(seed=0, n=30):
    rng = np.random.RandomState(seed)
    ans_pool = ["yes", "no", "two", "blue car", "None", "a dog, maybe"]
    annotations, results = [], []
    for qid in range(n):
        answers = [{"answer": ans_pool[rng.randint(len(ans_pool))],
                    "answer_id": k + 1} for k in range(10)]
        annotations.append({
            "question_id": qid,
            "question_type": "what",
            "answer_type": "other",
            "answers": answers,
        })
        results.append({"question_id": qid,
                        "answer": ans_pool[rng.randint(len(ans_pool))]})
    return annotations, results


def test_vqa_normalization():
    assert normalize_answer("Two") == "2"
    assert normalize_answer("a dog") == "dog"
    assert normalize_answer("dont") == "don't"
    assert normalize_answer("blue.") == "blue"
    assert normalize_answer("yes!") == "yes"


def test_vqa_eval_perfect():
    anns, _ = _make_vqa_fixture()
    # predict each question's most common answer -> accuracy equals the
    # official formula's value; sanity: all-same-answers case gives 100
    anns1 = [{"question_id": 0, "question_type": "what",
              "answer_type": "other",
              "answers": [{"answer": "yes", "answer_id": k + 1}
                          for k in range(10)]}]
    ev = VQAOfficialEval(anns1, [{"question_id": 0, "answer": "yes"}])
    assert ev.evaluate()["overall"] == pytest.approx(100.0)
    ev0 = VQAOfficialEval(anns1, [{"question_id": 0, "answer": "no"}])
    assert ev0.evaluate()["overall"] == pytest.approx(0.0)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_vqa_eval_parity_with_reference():
    """Cross-check the full evaluator against the reference implementation
    on randomized annotations (incl. punctuation/digit/article edge cases)."""
    sys.path.insert(0, os.path.join(REF, "eval", "vqacpv2"))
    from vqaEval import VQAEval as RefEval

    anns, results = _make_vqa_fixture(seed=3)

    class FakeVQA:
        def __init__(self, anns):
            self.qa = {a["question_id"]: a for a in anns}

        def getQuesIds(self):
            return list(self.qa.keys())

    class FakeRes:
        def __init__(self, results):
            self.qa = {r["question_id"]: r for r in results}

    import copy
    ref = RefEval(FakeVQA(copy.deepcopy(anns)), FakeRes(results))
    ref.evaluate()

    ours = VQAOfficialEval(anns, results)
    acc = ours.evaluate()
    assert acc["overall"] == pytest.approx(ref.accuracy["overall"])
    assert acc["perAnswerType"] == ref.accuracy["perAnswerType"]


def test_gqa_eval_consistency_and_distribution(tmp_path):
    questions = make_gqa_questions(tmp_path, n=8)
    # entailment: q0 entails q1/q2
    for qid in questions:
        questions[qid]["entailed"] = []
    questions["q0"]["entailed"] = ["q1", "q2"]
    qfile = tmp_path / "q.json"
    qfile.write_text(json.dumps(questions))

    preds = {q: v["answer"] for q, v in questions.items()}
    preds["q1"] = "wrong"  # breaks one entailed consistency + distribution
    pfile = tmp_path / "p.json"
    pfile.write_text(json.dumps(
        [{"questionId": q, "prediction": a} for q, a in preds.items()]))
    ev = GQAEval(str(pfile), str(qfile), eval_consistency=True)
    # q0 correct with 2 entailed: q1 wrong, q2 right -> consistency 50
    assert ev.scores["consistency"] == pytest.approx(50.0)
    assert ev.scores["distribution"] > 0  # predicted dist deviates from gold


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_gqa_eval_parity_with_reference(tmp_path, monkeypatch):
    """Cross-check GQAEval against the reference implementation on a shared
    randomized fixture: accuracy/binary/open, distribution (chi-square),
    consistency, validity/plausibility, head/tail confusion, and the
    formatted result strings (reference eval/gqa_ood/gqa_eval.py)."""
    sys.path.insert(0, os.path.join(REF, "eval", "gqa_ood"))
    from gqa_eval import GQAEval as RefGQAEval

    rng = np.random.RandomState(7)
    answers = ["yes", "no", "red", "blue", "dog", "cat"]
    structurals = ["query", "verify", "compare", "logic"]
    semantics = ["attr", "rel", "obj"]
    groups = ["color", "animal", None]
    questions, choices = {}, {}
    for i in range(60):
        qid = f"q{i}"
        gold = answers[rng.randint(len(answers))]
        questions[qid] = {
            "answer": gold,
            "isBalanced": bool(rng.rand() < 0.8),
            "question": " ".join(["w"] * rng.randint(3, 9)) + " ?",
            "types": {
                "structural": structurals[rng.randint(len(structurals))],
                "semantic": semantics[rng.randint(len(semantics))],
                "detailed": "chooseCommon" if rng.rand() < 0.2 else "x"},
            "groups": {"global": groups[rng.randint(len(groups))]},
            "semantic": [
                {"operation": op, "argument": "a"}
                for op in rng.choice(
                    ["select", "exist", "query: name", "filter",
                     "choose name", "relate"], size=rng.randint(1, 5))],
            "ans_head": ["yes", "no", "dog"],
            "ans_tail": ["red", "cat"],
            "entailed": [],
        }
        choices[qid] = {"valid": answers[:4], "plausible": answers[:2]}
    # entailment chains (every entailed qid must also be predicted)
    questions["q0"]["entailed"] = ["q1", "q2"]
    questions["q5"]["entailed"] = ["q5", "q6"]  # self-entailment is dropped
    questions["q10"]["entailed"] = ["q11"]

    # ~60% correct predictions, rest random wrong
    preds = []
    for qid, q in questions.items():
        if rng.rand() < 0.6:
            preds.append({"questionId": qid, "prediction": q["answer"]})
        else:
            preds.append({"questionId": qid,
                          "prediction": answers[rng.randint(len(answers))]})

    qfile, pfile, cfile = (tmp_path / n for n in
                           ("q.json", "p.json", "c.json"))
    qfile.write_text(json.dumps(questions))
    pfile.write_text(json.dumps(preds))
    cfile.write_text(json.dumps(choices))

    monkeypatch.chdir(tmp_path)  # reference dumps gqa_reasoning.json to CWD
    ref = RefGQAEval(str(pfile), str(qfile), choices_path=str(cfile),
                     EVAL_CONSISTENCY=True, EVAL_HEAD_TAIL=True)
    ours = GQAEval(str(pfile), str(qfile), choices_path=str(cfile),
                   eval_consistency=True, eval_head_tail=True)

    for k in ("accuracy", "binary", "open", "consistency", "validity",
              "plausibility", "distribution"):
        assert ours.scores[k] == pytest.approx(ref.scores[k]), k
    for k in ("accuracyPerStructuralType", "accuracyPerSemanticType",
              "accuracyPerSteps", "accuracyPerLength"):
        assert set(ours.scores[k]) == set(ref.scores[k]), k
        for t in ref.scores[k]:
            assert ours.scores[k][t][0] == pytest.approx(
                ref.scores[k][t][0]), (k, t)
            assert ours.scores[k][t][1] == ref.scores[k][t][1], (k, t)
    # head/tail confusion: same per-cell counts and correctness sums
    for p in range(3):
        for g in range(3):
            o, r = ours.scores["head_tail"][p][g], ref.scores["head_tail"][p][g]
            assert len(o) == len(r) and sum(o) == sum(r), (p, g)
    assert ours.get_acc_result()["accuracy"] == pytest.approx(
        ref.get_acc_result()["accuracy"])
    lines, detail = ours.get_str_result()
    assert lines == ref.result_string


def test_tail_size_sweep_and_plot(tmp_path):
    from xggm_tpu.evals.gqa_eval import tail_size_sweep
    from xggm_tpu.evals.plot_tail import plot_tail

    questions = make_gqa_questions(tmp_path, n=10)
    alpha_dir = tmp_path / "alpha_tail"
    alpha_dir.mkdir()
    for alpha in (1.0, 0.0):
        (alpha_dir / f"val_bal_tail_{alpha:.1f}.json").write_text(
            json.dumps(questions))
    preds = [{"questionId": q, "prediction": v["answer"]}
             for q, v in questions.items()]
    pfile = tmp_path / "p.json"
    pfile.write_text(json.dumps(preds))
    alphas, accs = tail_size_sweep(str(pfile), str(alpha_dir), (1.0, 0.0))
    assert accs == [pytest.approx(100.0)] * 2
    out = plot_tail([a + 1 for a in alphas], accs, "t",
                    out_path=str(tmp_path / "tail.pdf"))
    assert os.path.exists(out)


def test_plot_tail_smoke(tmp_path):
    """§2.6 plot_tail (reference eval/gqa_ood/plot_tail.py:8-37): produces
    a file, log-x axis, one line per model call."""
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    from xggm_tpu.evals.plot_tail import plot_tail

    alphas = [1.2, 1.5, 2.0, 3.0, 5.0, 9.0]
    accs = [38.0, 41.5, 45.0, 48.2, 51.0, 53.5]
    # capture the axes plot_tail builds (it closes the figure itself)
    import matplotlib.pyplot as plt

    captured = {}
    real_subplots = plt.subplots

    def grab(*a, **kw):
        fig, ax = real_subplots(*a, **kw)
        captured["ax"] = ax
        return fig, ax

    plt.subplots = grab
    try:
        out = plot_tail(alphas, accs, model_name="X-GGM",
                        out_path=str(tmp_path / "tail.pdf"))
    finally:
        plt.subplots = real_subplots
    assert os.path.isfile(out) and os.path.getsize(out) > 0
    ax = captured["ax"]
    assert ax.get_xscale() == "log"
    lines = ax.get_lines()
    assert len(lines) == 1 and lines[0].get_label() == "X-GGM"
    assert list(lines[0].get_ydata()) == accs
