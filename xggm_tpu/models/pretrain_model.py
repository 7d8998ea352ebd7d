"""LXMERT pretraining model + losses.

Behavioral spec from reference LXRTPretraining (src/lxrt/modeling.py:955-1061):
joint encoder -> {masked-LM CE(ignore -1), matched CE, per-visual-loss
obj/attr CE + feat SmoothL1 (each masked by confidence and weighted 1/0.15),
QA CE(ignore -1)}, summed. Loss vector order matches the reference's
LOSSES_NAME = (Mask_LM, Matched, Obj, Attr, Feat, QA)
(src/pretrain/lxmert_pretrain.py:217).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from xggm_tpu.config import LxmertConfig
from xggm_tpu.models.lxmert import (
    LxmertModel, AnswerHead, LMPredictionHead, VisualObjHead, dense,
)
from xggm_tpu.ops.losses import cross_entropy, smooth_l1

Array = jax.Array

VISUAL_LOSS_WEIGHT = 1.0 / 0.15  # reference modeling.py:168-172
LOSSES_NAME = ("Mask_LM", "Matched", "Obj", "Attr", "Feat", "QA")


class PretrainModel(nn.Module):
    """LXRTPretraining equivalent."""

    cfg: LxmertConfig
    num_answers: int = 2
    task_mask_lm: bool = True
    task_matched: bool = True
    task_obj_predict: bool = True
    task_qa: bool = True
    visual_losses: Tuple[str, ...] = ("obj", "attr", "feat")

    def setup(self):
        c = self.cfg.bert
        v = self.cfg.visual
        dt = self.cfg.compute_dtype
        self.bert = LxmertModel(self.cfg, name="lxrt")
        self.lm_head = LMPredictionHead(c, dt, name="lm_head")
        self.seq_relationship = dense(2, dt, name="seq_relationship")
        if self.task_obj_predict:
            dims = {"obj": v.obj_id_num, "attr": v.attr_id_num,
                    "feat": v.visual_feat_dim}
            self.obj_head = VisualObjHead(
                c, self.visual_losses,
                tuple(dims[k] for k in self.visual_losses), dt,
                name="obj_head")
        if self.task_qa:
            self.answer_head = AnswerHead(c.hidden_size, self.num_answers,
                                          dt, name="answer_head")

    def __call__(self, input_ids: Array, input_mask: Array,
                 segment_ids: Array, feats: Array, boxes: Array,
                 deterministic: bool = True):
        (lang, visn), pooled = self.bert(
            input_ids, input_mask, segment_ids, feats, boxes,
            deterministic=deterministic)
        # tied decoder (reference modeling.py:642-660): reuse the word
        # embedding table, available on the bound submodule after its call
        word_table = self.bert.variables["params"]["embeddings"][
            "word_embeddings"]["embedding"]
        lm_logits = self.lm_head(lang, word_table)
        matched_logits = self.seq_relationship(pooled).astype(jnp.float32)
        visn_preds = self.obj_head(visn) if self.task_obj_predict else None
        ans_logits = self.answer_head(pooled) if self.task_qa \
            else pooled[:, :1].astype(jnp.float32)
        return lm_logits, matched_logits, visn_preds, ans_logits

    def compute_losses(self, batch: Dict[str, Array],
                       deterministic: bool = False
                       ) -> Tuple[Array, Dict[str, Array], Array]:
        """Full pretraining objective (reference modeling.py:1007-1061).
        Returns (total_loss, named losses, answer_logits)."""
        lm_logits, matched_logits, visn_preds, ans_logits = self(
            batch["input_ids"], batch["input_mask"], batch["segment_ids"],
            batch["feats"], batch["boxes"], deterministic=deterministic)

        total = 0.0
        losses: Dict[str, Array] = {}
        if self.task_mask_lm:
            lm_loss = cross_entropy(
                lm_logits.reshape(-1, self.cfg.bert.vocab_size),
                batch["lm_labels"].reshape(-1), ignore_index=-1)
            total += lm_loss
            losses["Mask_LM"] = lm_loss
        if self.task_matched:
            m_loss = cross_entropy(matched_logits, batch["matched_labels"],
                                   ignore_index=-1)
            total += m_loss
            losses["Matched"] = m_loss
        if self.task_obj_predict:
            for key in self.visual_losses:
                pred = visn_preds[key]
                label = batch[f"{key}_labels"]
                conf = batch[f"{key}_mask"].reshape(-1).astype(jnp.float32)
                if key == "feat":
                    per = smooth_l1(pred.reshape(-1, pred.shape[-1]),
                                    label.reshape(-1, pred.shape[-1]))
                    per = jnp.mean(per, axis=1)  # regression: mean over dim
                else:
                    per = cross_entropy(pred.reshape(-1, pred.shape[-1]),
                                        label.reshape(-1), ignore_index=-1,
                                        reduction="none")
                vloss = jnp.mean(per * conf) * VISUAL_LOSS_WEIGHT
                total += vloss
                losses[key.capitalize()] = vloss
        if self.task_qa:
            qa_loss = cross_entropy(ans_logits, batch["ans"], ignore_index=-1)
            total += qa_loss
            losses["QA"] = qa_loss
        return total, losses, ans_logits
