"""Answer vocabulary table + pretrained answer-head weight surgery.

Behavioral spec from reference src/pretrain/qa_answer_table.py:8-198:
the LXMERT pretraining answer head covers a canonical ~9500-answer
vocabulary; when fine-tuning on a task with its own label2ans, each task
answer row of logit_fc's final layer is initialized from the pretrained row
of the normalized answer string (articles stripped, number words mapped,
'grey'->'gray', ...), and zeroed when the answer is absent.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from xggm_tpu.utils.io import load_json

# reference qa_answer_table.py:9-25
ANS_CONVERT = {
    "a man": "man", "the man": "man",
    "a woman": "woman", "the woman": "woman",
    "one": "1", "two": "2", "three": "3", "four": "4", "five": "5",
    "six": "6", "seven": "7", "eight": "8", "nine": "9", "ten": "10",
    "grey": "gray",
}


class AnswerTable:
    """Canonical answer vocabulary (reference qa_answer_table.py:8-82)."""

    def __init__(self, all_ans_path: str, dsets: Optional[Sequence[str]] = None):
        all_ans = load_json(all_ans_path)
        if dsets is not None:
            ds = set(dsets)
            self.anss: List[str] = [a["ans"] for a in all_ans
                                    if set(a["dsets"]) & ds]
        else:
            self.anss = [a["ans"] for a in all_ans]
        self.ans_set = set(self.anss)
        self._ans2id = {ans: i for i, ans in enumerate(self.anss)}
        assert len(self.anss) == len(self._ans2id)

    @staticmethod
    def convert_ans(ans: str) -> str:
        """Normalize an answer string (reference qa_answer_table.py:45-60)."""
        if len(ans) == 0:
            return ""
        ans = ans.lower()
        if ans.endswith("."):
            ans = ans[:-1].strip()
        for art in ("a ", "an ", "the "):
            if ans.startswith(art):
                ans = ans[len(art):].strip()
                break
        return ANS_CONVERT.get(ans, ans)

    def used(self, ans: str) -> bool:
        return ans in self.ans_set

    def ans2id(self, ans: str) -> int:
        return self._ans2id[ans]

    def id2ans(self, i: int) -> str:
        return self.anss[i]

    @property
    def num_answers(self) -> int:
        return len(self.anss)


def surger_answer_head(pre_weight: np.ndarray, pre_bias: np.ndarray,
                       cur_weight: np.ndarray, cur_bias: np.ndarray,
                       label2ans: Sequence[str], table: AnswerTable
                       ) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Row surgery (reference load_lxmert_qa, qa_answer_table.py:159-186).

    Shapes follow OUR layout: weight [in_dim, num_answers] (jax kernel), the
    torch fixture rows become columns. pre_* cover the pretraining answer
    vocab; cur_* the task vocab. Rows for unmatched answers are ZEROED (not
    kept), exactly as the reference.
    """
    new_w = cur_weight.copy()
    new_b = cur_bias.copy()
    loaded = unload = 0
    for label, ans in enumerate(label2ans):
        norm = table.convert_ans(ans)
        if table.used(norm):
            j = table.ans2id(norm)
            new_w[:, label] = pre_weight[:, j]
            new_b[label] = pre_bias[j]
            loaded += 1
        else:
            new_w[:, label] = 0.0
            new_b[label] = 0.0
            unload += 1
    return new_w, new_b, loaded, unload


def load_lxmert_qa(path: str, params: dict, label2ans: Sequence[str],
                   cfg, all_ans_path: str = "data/lxmert/all_ans.json") -> dict:
    """Load LXMERT-pretraining weights (torch `{path}_LXRT.pth`) into a task
    param tree: full encoder + answer-head surgery (reference
    qa_answer_table.py:125-198).

    The torch snapshot holds `bert.*` (LXRTModel) and `answer_head.logit_fc.*`
    keys (LXRTPretraining, reference modeling.py:955-986)."""
    from xggm_tpu.checkpoint.torch_bridge import (
        load_torch_state_dict, strip_prefixes, convert_lxrt_bert, merge_into)

    sd = strip_prefixes(load_torch_state_dict(
        path if path.endswith(".pth") else f"{path}_LXRT.pth"))

    flat, mapper = convert_lxrt_bert(sd, cfg, torch_prefix="bert.",
                                     our_prefix="lxrt")
    # encoder-key coverage assert (reference qa_answer_table.py:188-190)
    assert not mapper.missing, f"encoder keys missing: {mapper.missing[:5]}"

    # answer-head transform layers load verbatim
    m2 = mapper.__class__(sd)
    m2.linear("answer_head.logit_fc.0", "logit_fc/fc1")
    m2.layernorm("answer_head.logit_fc.2", "logit_fc/ln")
    flat.update(m2.out)

    # final-layer surgery
    table = AnswerTable(all_ans_path)
    pre_w = np.ascontiguousarray(sd["answer_head.logit_fc.3.weight"].T)
    pre_b = sd["answer_head.logit_fc.3.bias"]
    cur_w = np.asarray(params["params"]["logit_fc"]["fc2"]["kernel"])
    cur_b = np.asarray(params["params"]["logit_fc"]["fc2"]["bias"])
    new_w, new_b, loaded, unload = surger_answer_head(
        pre_w, pre_b, cur_w, cur_b, label2ans, table)
    print(f"Loaded {loaded} answers from LXRTQA pre-training and {unload} not")
    flat["logit_fc/fc2/kernel"] = new_w
    flat["logit_fc/fc2/bias"] = new_b

    new_params, _ = merge_into(params, flat)
    return new_params
