"""GSM8K harness tests: answer extraction, accuracy computation, and a
full run with a mock generator + the real generation loop on a tiny model."""

import numpy as np
import pytest

from microscopiq_tpu.eval.gsm8k import (
    evaluate_gsm8k,
    extract_answer_gt,
    extract_answer_pred,
    is_correct,
    load_gsm8k,
)


def test_extract_gt():
    assert extract_answer_gt("blah blah #### 42") == "42"
    assert extract_answer_gt("#### 1,234") == "1234"
    assert extract_answer_gt("no answer") == "[invalid]"


def test_extract_pred():
    assert extract_answer_pred("so 3 + 5 = 8. The answer is 8.") == "8"
    assert extract_answer_pred("costs $1,250 total") == "1250"
    assert extract_answer_pred("nothing numeric") == "[invalid]"


def test_is_correct():
    assert is_correct("8", "8")
    assert is_correct("8.0", "8")
    assert not is_correct("7", "8")
    assert not is_correct("[invalid]", "8")


def test_evaluate_with_oracle(tmp_path):
    rows = load_gsm8k(16)

    def oracle(prompts):
        outs = []
        for p in prompts:
            q = p.split("Question: ")[-1]
            row = next(r for r in rows if r["question"] in q)
            outs.append(row["answer"].split("####")[0] +
                        "The answer is " +
                        extract_answer_gt(row["answer"]) + ".")
        return outs

    res = evaluate_gsm8k(oracle, limit=16, batch_size=4,
                         output_dir=str(tmp_path))
    assert res["accuracy"] == 1.0
    assert (tmp_path / "evaluation_gsm8k.json").exists()
    assert (tmp_path / "generations.jsonl").exists()


def test_evaluate_with_bad_generator():
    res = evaluate_gsm8k(lambda ps: ["i do not know"] * len(ps), limit=8)
    assert res["accuracy"] == 0.0


# ---------------------------------------------------------------------------
# BBH / MMLU / AQuA CoT evaluators (absent from the reference's repo —
# its scripts reference them; we supply working ones, eval/cot_tasks.py)
# ---------------------------------------------------------------------------
def test_cot_task_extract_choice():
    from microscopiq_tpu.eval.cot_tasks import extract_choice
    assert extract_choice("blah. The answer is (B).") == "B"
    assert extract_choice("answer: C") == "C"
    assert extract_choice("The answer is (a)") == "A"
    assert extract_choice("no answer here") == "[invalid]"
    # last answer wins (CoT often restates)
    assert extract_choice("The answer is (A). Wait, the answer is (D).") \
        == "D"


def test_cot_task_eval_oracle(tmp_path):
    """An oracle generator that reads the right option scores 100%."""
    import re as _re

    from microscopiq_tpu.eval.cot_tasks import (evaluate_cot_task,
                                                load_task)

    for task in ("bbh", "mmlu", "aqua"):
        rows = load_task(task, limit=8)
        lookup = {r["question"]: r["answer"] for r in rows}

        def oracle(prompts):
            outs = []
            for p in prompts:
                q = p.split("Question: ")[-1].split(
                    "\nLet's think")[0]
                outs.append(f"The answer is ({lookup[q]}).")
            return outs

        res = evaluate_cot_task(task, oracle, limit=8,
                                output_dir=str(tmp_path))
        assert res["accuracy"] == 1.0, (task, res)
        assert (tmp_path / f"evaluation_{task}.json").exists()


def test_cot_task_eval_wrong_answers():
    from microscopiq_tpu.eval.cot_tasks import evaluate_cot_task
    res = evaluate_cot_task("mmlu", lambda ps: ["The answer is (E)."
                                                for _ in ps], limit=8)
    assert res["accuracy"] == 0.0
