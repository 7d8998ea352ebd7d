"""PyTorch -> JAX weight bridge.

Converts reference checkpoints (torch state dicts from
jingjing12110/X-GGM, LXMERT .pth snapshots, BERT archives) into this
framework's parameter pytrees. Handles the reference's loading quirks:

* `.module` DataParallel prefix stripping (reference src/lxrt/entry.py:141-143)
* old TF-style `gamma`/`beta` LayerNorm names (reference modeling.py:850-860)
* fused projections: torch's separate q/k/v (and cross-attention k/v) linears
  concatenate into this framework's single qkv / kv MXU matmuls
* answer-head row surgery keyed by normalized answer strings
  (reference src/pretrain/qa_answer_table.py:125-198) lives in
  xggm_tpu.checkpoint.answer_table
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

from xggm_tpu.config import LxmertConfig


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth state dict to numpy (no CUDA needed)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}


def strip_prefixes(sd: Dict[str, np.ndarray],
                   prefixes: Iterable[str] = (".module", "module.")
                   ) -> Dict[str, np.ndarray]:
    """Strip DataParallel prefixes and rename gamma/beta -> weight/bias
    (reference entry.py:141-143, modeling.py:850-860)."""
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        k = k.replace(".module.", ".")
        if k.endswith(".gamma"):
            k = k[: -len("gamma")] + "weight"
        elif k.endswith(".beta"):
            k = k[: -len("beta")] + "bias"
        out[k] = v
    return out


class _Mapper:
    """Accumulates (our_path -> array) while tracking consumed torch keys."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.out: Dict[str, np.ndarray] = {}
        self.used: set = set()
        self.missing: List[str] = []

    def _take(self, key: str) -> Optional[np.ndarray]:
        if key in self.sd:
            self.used.add(key)
            return self.sd[key]
        self.missing.append(key)
        return None

    def linear(self, tkey: str, opath: str):
        w = self._take(f"{tkey}.weight")
        b = self._take(f"{tkey}.bias")
        if w is not None:
            self.out[f"{opath}/kernel"] = np.ascontiguousarray(w.T)
        if b is not None:
            self.out[f"{opath}/bias"] = b

    def linear_nobias(self, tkey: str, opath: str):
        w = self._take(f"{tkey}.weight")
        if w is not None:
            self.out[f"{opath}/kernel"] = np.ascontiguousarray(w.T)

    def fused_linear(self, tkeys: List[str], opath: str):
        """Concatenate several torch linears into one fused projection."""
        ws = [self._take(f"{t}.weight") for t in tkeys]
        bs = [self._take(f"{t}.bias") for t in tkeys]
        if all(w is not None for w in ws):
            self.out[f"{opath}/kernel"] = np.concatenate(
                [np.ascontiguousarray(w.T) for w in ws], axis=1)
        if all(b is not None for b in bs):
            self.out[f"{opath}/bias"] = np.concatenate(bs, axis=0)

    def layernorm(self, tkey: str, opath: str):
        w = self._take(f"{tkey}.weight")
        b = self._take(f"{tkey}.bias")
        if w is not None:
            self.out[f"{opath}/scale"] = w
        if b is not None:
            self.out[f"{opath}/bias"] = b

    def embedding(self, tkey: str, opath: str):
        w = self._take(f"{tkey}.weight")
        if w is not None:
            self.out[f"{opath}/embedding"] = w


def _map_bert_layer(m: _Mapper, t: str, o: str):
    """One BertLayer: torch `{t}.attention...` -> our `{o}/...`."""
    m.fused_linear([f"{t}.attention.self.query", f"{t}.attention.self.key",
                    f"{t}.attention.self.value"], f"{o}/attention/self/qkv")
    m.linear(f"{t}.attention.output.dense", f"{o}/attention/output/dense")
    m.layernorm(f"{t}.attention.output.LayerNorm",
                f"{o}/attention/output/LayerNorm")
    m.linear(f"{t}.intermediate.dense", f"{o}/mlp/intermediate")
    m.linear(f"{t}.output.dense", f"{o}/mlp/output")
    m.layernorm(f"{t}.output.LayerNorm", f"{o}/mlp/LayerNorm")


def _map_self_att(m: _Mapper, t: str, o: str):
    """A BertSelfattLayer (self.self + self.output)."""
    m.fused_linear([f"{t}.self.query", f"{t}.self.key", f"{t}.self.value"],
                   f"{o}/self/qkv")
    m.linear(f"{t}.output.dense", f"{o}/output/dense")
    m.layernorm(f"{t}.output.LayerNorm", f"{o}/output/LayerNorm")


def _map_x_layer(m: _Mapper, t: str, o: str):
    m.linear(f"{t}.visual_attention.att.query", f"{o}/visual_attention/att/query")
    m.fused_linear([f"{t}.visual_attention.att.key",
                    f"{t}.visual_attention.att.value"],
                   f"{o}/visual_attention/att/kv")
    m.linear(f"{t}.visual_attention.output.dense",
             f"{o}/visual_attention/output/dense")
    m.layernorm(f"{t}.visual_attention.output.LayerNorm",
                f"{o}/visual_attention/output/LayerNorm")
    _map_self_att(m, f"{t}.lang_self_att", f"{o}/lang_self_att")
    _map_self_att(m, f"{t}.visn_self_att", f"{o}/visn_self_att")
    m.linear(f"{t}.lang_inter.dense", f"{o}/lang_mlp/intermediate")
    m.linear(f"{t}.lang_output.dense", f"{o}/lang_mlp/output")
    m.layernorm(f"{t}.lang_output.LayerNorm", f"{o}/lang_mlp/LayerNorm")
    m.linear(f"{t}.visn_inter.dense", f"{o}/visn_mlp/intermediate")
    m.linear(f"{t}.visn_output.dense", f"{o}/visn_mlp/output")
    m.layernorm(f"{t}.visn_output.LayerNorm", f"{o}/visn_mlp/LayerNorm")


_STACK_GROUPS = (
    # (per-layer path prefix, stacked path, layer-count attribute)
    ("x_layer", "x_stack", "x_layers"),
    ("r_layer", "r_stack", "r_layers"),
    ("layer", "lang_stack", "l_layers"),
)


def stack_encoder_flat(flat: Dict[str, np.ndarray], cfg: LxmertConfig,
                       our_prefix: str = "lxrt") -> Dict[str, np.ndarray]:
    """Per-layer encoder paths -> scan-stacked layout.

    `{p}/encoder/layer_{i}/REST` (i = 0..L-1) becomes ONE
    `{p}/encoder/lang_stack/layer/REST` array with a leading [L] axis
    (likewise r_layer -> r_stack, x_layer -> x_stack), matching the
    nn.scan parameter layout of models/lxmert.LxmertEncoder when
    cfg.stacked_layers. Incomplete groups (a layer's tensor missing from the
    checkpoint) are dropped with the per-layer keys - merge_into will then
    report the stacked path as unmatched rather than loading a ragged stack.
    """
    import re

    pat = re.compile(
        rf"^{re.escape(our_prefix)}/encoder/(x_layer|r_layer|layer)_(\d+)/(.*)$")
    lengths = {p: getattr(cfg.visual, attr) for p, _, attr in _STACK_GROUPS}
    stack_name = {p: s for p, s, _ in _STACK_GROUPS}
    out: Dict[str, np.ndarray] = {}
    per: Dict[Tuple[str, str], Dict[int, np.ndarray]] = {}
    for k, v in flat.items():
        mm = pat.match(k)
        if not mm:
            out[k] = v
            continue
        kind, idx, rest = mm.group(1), int(mm.group(2)), mm.group(3)
        per.setdefault((kind, rest), {})[idx] = v
    for (kind, rest), d in per.items():
        n = lengths[kind]
        if sorted(d) != list(range(n)):
            continue  # incomplete group: unmatched is better than ragged
        out[f"{our_prefix}/encoder/{stack_name[kind]}/layer/{rest}"] = \
            np.stack([d[i] for i in range(n)])
    return out


def unstack_encoder_flat(flat: Dict[str, np.ndarray], cfg: LxmertConfig,
                         our_prefix: str = "lxrt") -> Dict[str, np.ndarray]:
    """Inverse of stack_encoder_flat: split each stacked [L, ...] leaf back
    into per-layer `layer_{i}` paths (for per-layer-layout consumers and
    torch export round-trips)."""
    import re

    pat = re.compile(
        rf"^{re.escape(our_prefix)}/encoder/(x_stack|r_stack|lang_stack)/layer/(.*)$")
    layer_name = {s: p for p, s, _ in _STACK_GROUPS}
    out: Dict[str, np.ndarray] = {}
    for k, v in flat.items():
        mm = pat.match(k)
        if not mm:
            out[k] = v
            continue
        stack, rest = mm.group(1), mm.group(2)
        for i in range(v.shape[0]):
            out[f"{our_prefix}/encoder/{layer_name[stack]}_{i}/{rest}"] = v[i]
    return out


def convert_lxrt_bert(sd: Dict[str, np.ndarray], cfg: LxmertConfig,
                      torch_prefix: str = "", our_prefix: str = "lxrt"
                      ) -> Tuple[Dict[str, np.ndarray], _Mapper]:
    """Map a torch LXRTModel state dict (keys `embeddings.*`, `encoder.*`,
    `pooler.*` under `torch_prefix`) onto our LxmertModel tree. When
    cfg.stacked_layers (the default), per-layer tensors are stacked into the
    scan-over-layers [L, ...] layout."""
    m = _Mapper(sd)
    t = torch_prefix
    o = our_prefix

    m.embedding(f"{t}embeddings.word_embeddings",
                f"{o}/embeddings/word_embeddings")
    m.embedding(f"{t}embeddings.position_embeddings",
                f"{o}/embeddings/position_embeddings")
    m.embedding(f"{t}embeddings.token_type_embeddings",
                f"{o}/embeddings/token_type_embeddings")
    m.layernorm(f"{t}embeddings.LayerNorm", f"{o}/embeddings/LayerNorm")

    m.linear(f"{t}encoder.visn_fc.visn_fc", f"{o}/encoder/visn_fc/visn_fc")
    m.layernorm(f"{t}encoder.visn_fc.visn_layer_norm",
                f"{o}/encoder/visn_fc/visn_layer_norm")
    m.linear(f"{t}encoder.visn_fc.box_fc", f"{o}/encoder/visn_fc/box_fc")
    m.layernorm(f"{t}encoder.visn_fc.box_layer_norm",
                f"{o}/encoder/visn_fc/box_layer_norm")

    v = cfg.visual
    for i in range(v.l_layers):
        _map_bert_layer(m, f"{t}encoder.layer.{i}", f"{o}/encoder/layer_{i}")
    for i in range(v.r_layers):
        _map_bert_layer(m, f"{t}encoder.r_layers.{i}",
                        f"{o}/encoder/r_layer_{i}")
    for i in range(v.x_layers):
        _map_x_layer(m, f"{t}encoder.x_layers.{i}", f"{o}/encoder/x_layer_{i}")

    m.linear(f"{t}pooler.dense", f"{o}/pooler/dense")
    if getattr(cfg, "stacked_layers", False):
        m.out = stack_encoder_flat(m.out, cfg, our_prefix=o)
    return m.out, m


def convert_bert_text(sd: Dict[str, np.ndarray], num_layers: int = 12,
                      torch_prefix: str = "") -> Dict[str, np.ndarray]:
    """Map a plain BERT state dict (HF bert-base-uncased layout:
    `embeddings.*`, `encoder.layer.{i}.*`, `pooler.dense.*`) onto our
    BertTextModel tree."""
    m = _Mapper(strip_prefixes(sd))
    t = torch_prefix
    m.embedding(f"{t}embeddings.word_embeddings", "embeddings/word_embeddings")
    m.embedding(f"{t}embeddings.position_embeddings",
                "embeddings/position_embeddings")
    m.embedding(f"{t}embeddings.token_type_embeddings",
                "embeddings/token_type_embeddings")
    m.layernorm(f"{t}embeddings.LayerNorm", "embeddings/LayerNorm")
    for i in range(num_layers):
        _map_bert_layer(m, f"{t}encoder.layer.{i}", f"layer_{i}")
    m.linear(f"{t}pooler.dense", "pooler/dense")
    return m.out


def _map_linear_gelu_ln(m: _Mapper, t: str, o: str):
    """torch Sequential(Linear, GeLU, LayerNorm) -> our {fc, ln}."""
    m.linear(f"{t}.0", f"{o}/fc")
    m.layernorm(f"{t}.2", f"{o}/ln")


def _map_gcn(m: _Mapper, t: str, o: str, n_convs: int):
    for j in range(n_convs):
        m.linear_nobias(f"{t}.gnn_layers.{j}.ctx_layer", f"{o}/conv_{j}/ctx_layer")
        m.layernorm(f"{t}.gnn_layers.{j}.layer_norm", f"{o}/conv_{j}/layer_norm")
    for j in range(n_convs + 1):
        _map_linear_gelu_ln(m, f"{t}.linear_prediction.{j}", f"{o}/proj_{j}")


def _map_gin(m: _Mapper, t: str, o: str, n_convs: int):
    for j in range(n_convs):
        eps = m._take(f"{t}.gnn_convs.{j}.eps")
        if eps is not None:
            m.out[f"{o}/conv_{j}/eps"] = eps
        _map_linear_gelu_ln(m, f"{t}.gnn_convs.{j}.linear", f"{o}/conv_{j}/linear")
    for j in range(n_convs + 1):
        _map_linear_gelu_ln(m, f"{t}.linear_prediction.{j}", f"{o}/proj_{j}")


def convert_task_model(sd: Dict[str, np.ndarray], cfg: LxmertConfig,
                       gnn: str = "GCN", n_layers: int = 2,
                       gat_heads: int = 2) -> Dict[str, np.ndarray]:
    """Convert a full task-model checkpoint (reference GQAModel/VQAModel state
    dict, keys per src/gqa/gqa_ood_model.py:52-112) into a flat
    {path: array} for XGGMModel. Unflatten with `unflatten_params`."""
    sd = strip_prefixes(sd)
    flat, m = convert_lxrt_bert(sd, cfg,
                                torch_prefix="lxrt_encoder.model.bert.",
                                our_prefix="lxrt")
    # answer head: Sequential(Linear, GeLU, LayerNorm, Linear)
    m.linear("logit_fc.0", "logit_fc/fc1")
    m.layernorm("logit_fc.2", "logit_fc/ln")
    m.linear("logit_fc.3", "logit_fc/fc2")
    # GGM glue
    m.linear("encoder_adj.0", "encoder_adj")
    _map_linear_gelu_ln(m, "node_fc", "node_fc")
    _map_linear_gelu_ln(m, "fusion_fc", "fusion_fc")
    # generator
    for i in range(n_layers):
        t = f"generator.gnn_layers.{i}"
        o = f"generator/gnn_{i}"
        if gnn == "GCN":
            _map_gcn(m, t, o, n_convs=2)
        elif gnn == "GIN":
            _map_gin(m, t, o, n_convs=1)
        elif gnn == "GAT":
            # torch layout: {t}.gat_layers.{h}.{linear_layer,attn_layer}
            # attn_layer.weight [1, 2F] -> our attn [2F, 1]
            for h in range(gat_heads):
                th = f"{t}.gat_layers.{h}"
                oh = f"{o}/head_{h}"
                m.linear_nobias(f"{th}.linear_layer", f"{oh}/linear_layer")
                w = m._take(f"{th}.attn_layer.weight")
                if w is not None:
                    m.out[f"{oh}/attn"] = np.ascontiguousarray(w.T)
        else:
            raise ValueError(gnn)
    return m.out


def convert_pretrain_model(sd: Dict[str, np.ndarray], cfg: LxmertConfig,
                           visual_losses: Tuple[str, ...] = ("obj", "attr",
                                                             "feat")
                           ) -> Dict[str, np.ndarray]:
    """Convert a reference LXRTPretraining state dict (keys per
    src/lxrt/modeling.py:955-985: `bert.*`, `cls.predictions.*`,
    `cls.seq_relationship.*`, `obj_predict_head.*`, `answer_head.*`) onto our
    PretrainModel tree (models/pretrain_model.py)."""
    sd = strip_prefixes(sd)
    flat, m = convert_lxrt_bert(sd, cfg, torch_prefix="bert.",
                                our_prefix="lxrt")
    # masked-LM head; the decoder weight is TIED to the word embeddings
    # (modeling.py:649-652) - our LMPredictionHead reuses the table, so only
    # transform + bias convert
    m.linear("cls.predictions.transform.dense", "lm_head/transform/dense")
    m.layernorm("cls.predictions.transform.LayerNorm",
                "lm_head/transform/LayerNorm")
    bias = m._take("cls.predictions.bias")
    if bias is not None:
        m.out["lm_head/bias"] = bias
    m.linear("cls.seq_relationship", "seq_relationship")
    m.linear("answer_head.logit_fc.0", "answer_head/fc1")
    m.layernorm("answer_head.logit_fc.2", "answer_head/ln")
    m.linear("answer_head.logit_fc.3", "answer_head/fc2")
    m.linear("obj_predict_head.transform.dense", "obj_head/transform/dense")
    m.layernorm("obj_predict_head.transform.LayerNorm",
                "obj_head/transform/LayerNorm")
    for key in visual_losses:
        m.linear(f"obj_predict_head.decoder_dict.{key}",
                 f"obj_head/decoder_{key}")
    return m.out


def unflatten_params(flat: Dict[str, np.ndarray]) -> dict:
    """{a/b/c: arr} -> nested {'params': {a: {b: {c: arr}}}}."""
    tree: dict = {}
    for path, arr in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return {"params": tree}


def merge_into(params: dict, flat: Dict[str, np.ndarray],
               strict: bool = False) -> Tuple[dict, List[str]]:
    """Overlay converted arrays onto an initialized param tree (so missing
    heads keep their fresh init, mirroring the reference's
    load_state_dict(strict=False), gqa_ood.py:431). Returns (new_params,
    list of paths that did not match)."""
    import jax

    unmatched = []

    def visit(node, prefix):
        out = {}
        for k, v in node.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out[k] = visit(v, path)
            else:
                if path in flat:
                    src = flat[path]
                    if src.shape != v.shape:
                        unmatched.append(f"{path}: shape {src.shape} vs {v.shape}")
                        out[k] = v
                    else:
                        out[k] = jax.numpy.asarray(src, dtype=v.dtype)
                else:
                    unmatched.append(path)
                    out[k] = v
        return out

    new = visit(params["params"], "")
    extra = set(flat.keys()) - {
        "/".join(p) for p in _all_paths(params["params"])}
    if strict and (unmatched or extra):
        raise ValueError(f"unmatched: {unmatched[:10]} extra: {list(extra)[:10]}")
    return {"params": new}, unmatched


def _all_paths(node, prefix=()):
    for k, v in node.items():
        if isinstance(v, dict):
            yield from _all_paths(v, prefix + (k,))
        else:
            yield prefix + (k,)
