"""Generate golden parity fixtures from the reference PyTorch implementation.

Runs the reference (jingjing12110/X-GGM at XGGM_REFERENCE_PATH, default
/root/reference) on fixed inputs in eval mode and stores state dicts +
inputs + outputs as .npz under tests/goldens/. The parity tests then load
the same weights through the torch->JAX bridge and assert our outputs match.

This script READS the reference; no reference code is copied into the
framework. Re-run it if fixtures need regeneration:
    python tools/make_goldens.py
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np

REF = os.environ.get("XGGM_REFERENCE_PATH", "/root/reference")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens")


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m


def setup_reference():
    _stub("boto3")
    _stub("botocore")
    _stub("botocore.exceptions", ClientError=Exception)
    _stub("requests")
    sys.path.insert(0, os.path.join(REF, "src"))


def flat_sd(module):
    # .copy(): .numpy() on a CPU tensor ALIASES the live parameter storage -
    # a later optimizer step would silently mutate the snapshot
    return {k: v.detach().cpu().numpy().copy()
            for k, v in module.state_dict().items()}


def make_lxrt_golden():
    import torch
    import lxrt.modeling as M

    torch.manual_seed(0)
    M.VISUAL_CONFIG.l_layers = 2
    M.VISUAL_CONFIG.x_layers = 1
    M.VISUAL_CONFIG.r_layers = 1
    M.VISUAL_CONFIG.set_visual_dims(32, 4)
    cfg = M.BertConfig(vocab_size_or_config_json_file=128, hidden_size=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       intermediate_size=128, max_position_embeddings=64)
    model = M.LXRTModel(cfg)
    model.eval()

    rng = np.random.RandomState(7)
    B, L, N = 3, 20, 36
    ids = rng.randint(1, 128, (B, L)).astype(np.int64)
    mask = np.ones((B, L), np.int64)
    mask[:, 12:] = 0
    seg = np.zeros((B, L), np.int64)
    feats = rng.randn(B, N, 32).astype(np.float32)
    boxes = rng.rand(B, N, 4).astype(np.float32)

    with torch.no_grad():
        (lang, visn), pooled = model(
            torch.from_numpy(ids), torch.from_numpy(seg),
            torch.from_numpy(mask),
            visual_feats=(torch.from_numpy(feats), torch.from_numpy(boxes)))

    sd = flat_sd(model)
    np.savez_compressed(
        os.path.join(OUT, "lxrt_tiny.npz"),
        **{f"sd::{k}": v for k, v in sd.items()},
        input_ids=ids.astype(np.int32), input_mask=mask.astype(np.int32),
        segment_ids=seg.astype(np.int32), feats=feats, boxes=boxes,
        out_lang=lang.numpy(), out_visn=visn.numpy(),
        out_pooled=pooled.numpy())
    print("lxrt_tiny.npz: pooled mean", float(pooled.mean()))


def make_ggm_goldens():
    import torch
    from module.graph_generative_modeling import (
        GCNGenerator, GINGenerator, GATGenerator)

    rng = np.random.RandomState(3)
    B, N, H = 2, 36, 64
    x = rng.randn(B, N, H).astype(np.float32)
    adj = rng.rand(B, N, N).astype(np.float32)
    adj = (adj + adj.transpose(0, 2, 1)) / 2

    for name, cls, kw in [("gcn", GCNGenerator, {}),
                          ("gin", GINGenerator, {}),
                          ("gat", GATGenerator, {})]:
        torch.manual_seed(1)
        gen = cls(hidden_dim=H, n_layers=1 if name == "gat" else 2)
        gen.eval()
        with torch.no_grad():
            xo, ao = gen(torch.from_numpy(x), torch.from_numpy(adj))
        np.savez_compressed(
            os.path.join(OUT, f"ggm_{name}_tiny.npz"),
            **{f"sd::{k}": v for k, v in flat_sd(gen).items()},
            x=x, adj=adj, out_x=xo.numpy(), out_adj=ao.numpy())
        print(f"ggm_{name}_tiny.npz: out_x mean {float(xo.mean()):.6f}")


def make_task_glue_golden():
    """Task-model glue heads (reference src/gqa/gqa_ood_model.py:62-112):
    logit_fc / encoder_adj / node_fc / fusion_fc built exactly as the
    reference defines them (the full GQAModel cannot be instantiated offline
    - its __init__ downloads BERT weights), with the reference's own GeLU /
    BertLayerNorm modules. Includes the relation/representation glue math:
    triu scatter + symmetrize (gqa_ood.py:181-187) and
    fusion_fc(cat[x, tanh(mean(nodes))]) (gqa_ood.py:201-204)."""
    import torch
    import torch.nn as nn
    from lxrt.modeling import GeLU, BertLayerNorm

    torch.manual_seed(9)
    hid, num_ans = 64, 16
    logit_fc = nn.Sequential(nn.Linear(hid, hid * 2), GeLU(),
                             BertLayerNorm(hid * 2, eps=1e-12),
                             nn.Linear(hid * 2, num_ans))
    encoder_adj = nn.Sequential(nn.Linear(hid, 630), nn.Sigmoid())
    node_fc = nn.Sequential(nn.Linear(hid, hid), GeLU(), nn.LayerNorm(hid))
    fusion_fc = nn.Sequential(nn.Linear(hid * 2, hid), GeLU(),
                              nn.LayerNorm(hid))

    rng = np.random.RandomState(4)
    x = torch.from_numpy(rng.randn(3, hid).astype(np.float32))
    nodes = torch.from_numpy(rng.randn(3, 36, hid).astype(np.float32))

    with torch.no_grad():
        logits = logit_fc(x)
        # triu scatter + symmetrize (gqa_ood.py:181-187)
        vals = encoder_adj(x)
        adj = torch.zeros(3, 36, 36)
        triu = torch.ones(3, 36, 36).triu(1)
        adj[triu == 1] = vals.reshape(-1)
        adj = adj + adj.transpose(1, 2)
        node_out = node_fc(x.unsqueeze(1).repeat(1, 36, 1))
        x_gen = fusion_fc(torch.cat([x, torch.tanh(nodes.mean(1))], dim=-1))

    sd = {}
    for name, mod in [("logit_fc", logit_fc), ("encoder_adj", encoder_adj),
                      ("node_fc", node_fc), ("fusion_fc", fusion_fc)]:
        for k, v in mod.state_dict().items():
            sd[f"{name}.{k}"] = v.numpy()
    np.savez_compressed(
        os.path.join(OUT, "task_glue_tiny.npz"),
        **{f"sd::{k}": v for k, v in sd.items()},
        x=x.numpy(), nodes=nodes.numpy(),
        out_logits=logits.numpy(), out_adj=adj.numpy(),
        out_node=node_out.numpy(), out_xgen=x_gen.numpy())
    print("task_glue_tiny.npz: logits mean", float(logits.mean()))


def make_bert_adam_golden():
    import torch
    from lxrt.optimization import BertAdam

    torch.manual_seed(5)
    rng = np.random.RandomState(5)
    w0 = rng.randn(8, 4).astype(np.float32)
    b0 = rng.randn(4).astype(np.float32)
    w = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    b = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = BertAdam([{"params": [w]},
                    {"params": [b], "lr": 1e-3}],
                   lr=4e-3, warmup=0.1, t_total=10)
    grads_w, grads_b, traj_w, traj_b = [], [], [], []
    for step in range(6):
        gw = rng.randn(8, 4).astype(np.float32)
        gb = rng.randn(4).astype(np.float32)
        w.grad = torch.from_numpy(gw.copy())
        b.grad = torch.from_numpy(gb.copy())
        opt.step()
        grads_w.append(gw)
        grads_b.append(gb)
        traj_w.append(w.detach().numpy().copy())
        traj_b.append(b.detach().numpy().copy())
    np.savez_compressed(
        os.path.join(OUT, "bert_adam.npz"),
        w0=w0, b0=b0,
        grads_w=np.stack(grads_w), grads_b=np.stack(grads_b),
        traj_w=np.stack(traj_w), traj_b=np.stack(traj_b))
    print("bert_adam.npz: final w mean", float(traj_w[-1].mean()))


def make_loss_goldens():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(11)
    score = rng.randn(2, 36, 36).astype(np.float32)
    grad = rng.randn(2, 36, 36).astype(np.float32)
    sigma = 1.0
    sm = 0.5 * sigma ** 2 * ((torch.from_numpy(score) - torch.from_numpy(grad)
                              ) ** 2).sum(dim=[-1, -2]).mean()
    sm = sm / (36 * 36)

    x = rng.randn(2, 36, 36).astype(np.float32)
    y = rng.randn(2, 36, 36).astype(np.float32)
    tx, ty = torch.from_numpy(x), torch.from_numpy(y)
    px, log_px = F.softmax(tx, -1), F.log_softmax(tx, -1)
    py, log_py = F.softmax(ty, -1), F.log_softmax(ty, -1)
    kl = (F.kl_div(log_px, py, reduction="none")
          + F.kl_div(log_py, px, reduction="none")).mean()

    logits = rng.randn(4, 16).astype(np.float32)
    target = (rng.rand(4, 16) > 0.8).astype(np.float32)
    bce = torch.nn.BCEWithLogitsLoss()(torch.from_numpy(logits),
                                       torch.from_numpy(target))
    np.savez_compressed(
        os.path.join(OUT, "losses.npz"),
        score=score, grad=grad, sigma=np.float32(sigma),
        sm=np.float32(sm.item()),
        klx=x, kly=y, kl=np.float32(kl.item()),
        logits=logits, target=target, bce=np.float32(bce.item()))
    print("losses.npz:", float(sm), float(kl), float(bce))


def _pretrain_batch(rng, B, vocab=128, L=20, N=36, F=32, num_ans=16):
    """Fixed featurized pretraining batch in the reference forward's format
    (lxmert_pretrain.py:283-305): ids/seg/mask, -1-padded lm labels,
    matched labels, per-visual-loss (label, conf) pairs, -1-padded answers."""
    ids = rng.randint(1, vocab, (B, L)).astype(np.int64)
    mask = np.ones((B, L), np.int64)
    mask[:, 14:] = 0
    seg = np.zeros((B, L), np.int64)
    lm_labels = np.full((B, L), -1, np.int64)
    for b in range(B):  # a few masked positions per row
        for pos in rng.choice(12, 3, replace=False):
            lm_labels[b, pos] = rng.randint(1, vocab)
    feats = rng.randn(B, N, F).astype(np.float32)
    boxes = rng.rand(B, N, 4).astype(np.float32)
    matched = (rng.rand(B) > 0.5).astype(np.int64)
    obj_labels = rng.randint(0, 1600, (B, N)).astype(np.int64)
    attr_labels = rng.randint(0, 400, (B, N)).astype(np.int64)
    conf = (rng.rand(B, N) > 0.7).astype(np.float32)  # masked objects only
    feat_target = rng.randn(B, N, F).astype(np.float32)
    ans = np.where(matched.astype(bool) & (rng.rand(B) > 0.3),
                   rng.randint(0, num_ans, B), -1).astype(np.int64)
    return dict(input_ids=ids, segment_ids=seg, input_mask=mask,
                lm_labels=lm_labels, feats=feats, boxes=boxes,
                matched=matched, obj_labels=obj_labels,
                attr_labels=attr_labels, conf=conf, feat_target=feat_target,
                ans=ans)


def _pretrain_forward_args(torch, b):
    obj_labels = {"obj": (torch.from_numpy(b["obj_labels"]),
                          torch.from_numpy(b["conf"])),
                  "attr": (torch.from_numpy(b["attr_labels"]),
                           torch.from_numpy(b["conf"])),
                  "feat": (torch.from_numpy(b["feat_target"]),
                           torch.from_numpy(b["conf"]))}
    return (torch.from_numpy(b["input_ids"]),
            torch.from_numpy(b["segment_ids"]),
            torch.from_numpy(b["input_mask"]),
            torch.from_numpy(b["lm_labels"]),
            torch.from_numpy(b["feats"]), torch.from_numpy(b["boxes"]),
            obj_labels, torch.from_numpy(b["matched"]),
            torch.from_numpy(b["ans"]))


def _make_tiny_pretraining(M, num_ans=16, feat_dim=32):
    M.VISUAL_CONFIG.l_layers = 2
    M.VISUAL_CONFIG.x_layers = 1
    M.VISUAL_CONFIG.r_layers = 1
    M.VISUAL_CONFIG.set_visual_dims(feat_dim, 4)
    # the reference's visual_loss_config hardcodes feat dim 2048
    # (modeling.py:168-172); scale it to the tiny feat dim for the fixture
    M.VISUAL_CONFIG.visual_loss_config["feat"] = (
        feat_dim, "l2", (-1, feat_dim), 1 / 0.15)
    cfg = M.BertConfig(vocab_size_or_config_json_file=128, hidden_size=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       intermediate_size=128, max_position_embeddings=64)
    return M.LXRTPretraining(cfg, task_mask_lm=True, task_matched=True,
                             task_obj_predict=True,
                             visual_losses="obj,attr,feat", task_qa=True,
                             num_answers=num_ans)


def make_pretrain_golden():
    """LXRTPretraining 4-loss forward (reference modeling.py:1007-1061) on a
    fixed featurized batch: per-loss values + total + answer logits."""
    import torch
    import lxrt.modeling as M

    torch.manual_seed(0)
    model = _make_tiny_pretraining(M)
    model.eval()

    rng = np.random.RandomState(23)
    b = _pretrain_batch(rng, B=4)
    with torch.no_grad():
        total, losses, ans_logit = model(*_pretrain_forward_args(torch, b))
    np.savez_compressed(
        os.path.join(OUT, "pretrain_tiny.npz"),
        **{f"sd::{k}": v for k, v in flat_sd(model).items()},
        **{f"in::{k}": v for k, v in b.items()},
        total=np.float32(total.item()),
        losses=losses.numpy()[0].astype(np.float32),  # LM,Matched,Obj,Attr,Feat,QA
        ans_logit=ans_logit.numpy())
    print("pretrain_tiny.npz: total", float(total.item()),
          "losses", losses.numpy()[0].tolist())


def make_pretrain_trajectory_golden():
    """Reference pretraining loop (lxmert_pretrain.py:308-341): BertAdam
    warmup 0.05, clip 1.0, ONE optimizer step per batch - 4 steps over 2
    alternating fixed batches, dropout off (eval mode), loss sequence
    recorded."""
    import torch
    import lxrt.modeling as M
    from lxrt.optimization import BertAdam

    torch.manual_seed(0)
    model = _make_tiny_pretraining(M)
    model.eval()  # dropout off; grads still flow

    rng = np.random.RandomState(31)
    batches = [_pretrain_batch(rng, B=4) for _ in range(2)]
    sd0 = flat_sd(model)

    optim = BertAdam(model.parameters(), lr=1e-3, warmup=0.05, t_total=8)
    seq = []
    for step in range(4):
        b = batches[step % 2]
        optim.zero_grad()
        total, losses, _ = model(*_pretrain_forward_args(torch, b))
        total.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        optim.step()
        seq.append(np.concatenate([[total.item()],
                                   losses.detach().numpy()[0]]))
    np.savez_compressed(
        os.path.join(OUT, "pretrain_traj_tiny.npz"),
        **{f"sd::{k}": v for k, v in sd0.items()},
        **{f"b0::{k}": v for k, v in batches[0].items()},
        **{f"b1::{k}": v for k, v in batches[1].items()},
        loss_seq=np.asarray(seq, np.float32),
        final_pooler_kernel=model.bert.pooler.dense.weight.detach()
        .numpy().T.copy())
    print("pretrain_traj_tiny.npz: loss seq",
          [float(s[0]) for s in seq])


def main():
    os.makedirs(OUT, exist_ok=True)
    setup_reference()
    make_lxrt_golden()
    make_task_glue_golden()
    make_ggm_goldens()
    make_bert_adam_golden()
    make_loss_goldens()
    make_pretrain_golden()
    make_pretrain_trajectory_golden()


if __name__ == "__main__":
    main()
