"""HF checkpoint → flax param-tree conversion (offline, no network).

Replaces the reference's ``AutoModelForCausalLM.from_pretrained`` loading
(``llm/llama.py:20-58``, ``llm/opt.py:13-23``): reads a local HF state
dict (safetensors / torch .bin / an in-memory transformers model) and maps
it onto the microscopiq_tpu Llama/OPT param trees.
"""

from __future__ import annotations

import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from .llama import LlamaConfig
from .opt import OPTConfig


def load_hf_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load all weights from a local HF checkpoint directory."""
    state = {}
    files = sorted(os.listdir(path))
    st_files = [f for f in files if f.endswith(".safetensors")]
    bin_files = [f for f in files if f.endswith(".bin")]
    if st_files:
        from safetensors.numpy import load_file
        for f in st_files:
            state.update(load_file(os.path.join(path, f)))
    elif bin_files:
        import torch
        for f in bin_files:
            sd = torch.load(os.path.join(path, f), map_location="cpu",
                            weights_only=True)
            state.update({k: v.float().numpy() for k, v in sd.items()})
    else:
        raise FileNotFoundError(f"no safetensors/bin files in {path}")
    return state


def state_dict_from_torch_model(model) -> Dict[str, np.ndarray]:
    """In-memory transformers model → numpy state dict."""
    return {k: v.detach().float().numpy()
            for k, v in model.state_dict().items()}


def _t(w):  # HF (out, in) -> flax kernel (in, out)
    return jnp.asarray(np.ascontiguousarray(w.T))


def convert_llama(state: Dict[str, np.ndarray], cfg: LlamaConfig):
    """HF Llama/Mistral/Mixtral state dict → LlamaForCausalLM params."""
    p = {"model": {}}
    m = p["model"]
    m["embed_tokens"] = jnp.asarray(state["model.embed_tokens.weight"])
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}."
        layer = {
            "self_attn": {
                f"{n}_proj": {"kernel": _t(state[pre + f"self_attn.{n}_proj.weight"])}
                for n in ("q", "k", "v", "o")},
            "input_layernorm": {
                "scale": jnp.asarray(state[pre + "input_layernorm.weight"])},
            "post_attention_layernorm": {
                "scale": jnp.asarray(
                    state[pre + "post_attention_layernorm.weight"])},
        }
        if cfg.num_local_experts > 0:
            moe = {"gate": {"kernel": _t(
                state[pre + "block_sparse_moe.gate.weight"])}}
            for e in range(cfg.num_local_experts):
                ep = pre + f"block_sparse_moe.experts.{e}."
                moe[f"experts_{e}"] = {
                    "gate_proj": {"kernel": _t(state[ep + "w1.weight"])},
                    "down_proj": {"kernel": _t(state[ep + "w2.weight"])},
                    "up_proj": {"kernel": _t(state[ep + "w3.weight"])},
                }
            layer["block_sparse_moe"] = moe
        else:
            layer["mlp"] = {
                f"{n}_proj": {"kernel": _t(state[pre + f"mlp.{n}_proj.weight"])}
                for n in ("gate", "up", "down")}
        m[f"layers_{i}"] = layer
    m["norm"] = {"scale": jnp.asarray(state["model.norm.weight"])}
    if not cfg.tie_word_embeddings:
        key = "lm_head.weight"
        if key in state:
            p["lm_head"] = {"kernel": _t(state[key])}
        else:  # tied checkpoints
            p["lm_head"] = {"kernel": _t(state["model.embed_tokens.weight"])}
    return {"params": p}


def convert_mpt(state: Dict[str, np.ndarray], cfg: LlamaConfig):
    """HF MPT state dict → LlamaForCausalLM params (MPT family knobs).

    Layout (transformers modeling_mpt.py): transformer.wte, per block
    norm_1 / attn.Wqkv / attn.out_proj / norm_2 / ffn.{up,down}_proj,
    final transformer.norm_f; embeddings tied, all Linears biasless and
    every LayerNorm bias is None. Wqkv is split into q/k/v thirds here —
    serving refuses nothing: nn.mapping.fuse_projections re-merges them.
    """
    def g(k):
        return state.get("transformer." + k, state.get(k))

    d = cfg.hidden_size
    p = {"model": {}}
    m = p["model"]
    m["embed_tokens"] = jnp.asarray(g("wte.weight"))
    for i in range(cfg.num_hidden_layers):
        pre = f"blocks.{i}."
        wqkv = g(pre + "attn.Wqkv.weight")          # (3d, d)
        layer = {
            "self_attn": {
                "q_proj": {"kernel": _t(wqkv[:d])},
                "k_proj": {"kernel": _t(wqkv[d:2 * d])},
                "v_proj": {"kernel": _t(wqkv[2 * d:])},
                "o_proj": {"kernel": _t(g(pre + "attn.out_proj.weight"))},
            },
            "input_layernorm": {
                "scale": jnp.asarray(g(pre + "norm_1.weight"))},
            "post_attention_layernorm": {
                "scale": jnp.asarray(g(pre + "norm_2.weight"))},
            "mlp": {
                "up_proj": {"kernel": _t(g(pre + "ffn.up_proj.weight"))},
                "down_proj": {"kernel": _t(g(pre + "ffn.down_proj.weight"))},
            },
        }
        m[f"layers_{i}"] = layer
    m["norm"] = {"scale": jnp.asarray(g("norm_f.weight"))}
    if not cfg.tie_word_embeddings:
        p["lm_head"] = {"kernel": _t(state.get(
            "lm_head.weight", g("wte.weight")))}
    return {"params": p}


def convert_opt(state: Dict[str, np.ndarray], cfg: OPTConfig):
    """HF OPT state dict → OPTForCausalLM params."""
    def g(k):
        return state.get("model." + k, state.get(k))

    p = {}
    p["embed_tokens"] = jnp.asarray(g("decoder.embed_tokens.weight"))
    p["embed_positions"] = jnp.asarray(g("decoder.embed_positions.weight"))
    for i in range(cfg.num_hidden_layers):
        pre = f"decoder.layers.{i}."
        layer = {}
        attn = {}
        for n, ours in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                        ("v_proj", "v_proj"), ("out_proj", "out_proj")):
            attn[ours] = {
                "kernel": _t(g(pre + f"self_attn.{n}.weight")),
                "bias": jnp.asarray(g(pre + f"self_attn.{n}.bias"))}
        layer["self_attn"] = attn
        for ln_hf, ln_ours in (("self_attn_layer_norm",
                                "self_attn_layer_norm"),
                               ("final_layer_norm", "final_layer_norm")):
            layer[ln_ours] = {
                "scale": jnp.asarray(g(pre + f"{ln_hf}.weight")),
                "bias": jnp.asarray(g(pre + f"{ln_hf}.bias"))}
        for fc in ("fc1", "fc2"):
            layer[fc] = {"kernel": _t(g(pre + f"{fc}.weight")),
                         "bias": jnp.asarray(g(pre + f"{fc}.bias"))}
        p[f"layers_{i}"] = layer
    if cfg.do_layer_norm_before:
        p["final_layer_norm"] = {
            "scale": jnp.asarray(g("decoder.final_layer_norm.weight")),
            "bias": jnp.asarray(g("decoder.final_layer_norm.bias"))}
    return {"params": p}


def export_llama_state_dict(params, cfg: LlamaConfig
                            ) -> Dict[str, np.ndarray]:
    """LlamaForCausalLM params → HF-named numpy state dict.

    Inverse of :func:`convert_llama` (dense MLP Llama/Mistral only) — lets
    a model trained in this framework be loaded into
    ``transformers.LlamaForCausalLM`` for differential testing against the
    reference torch pipeline (``llm/llama.py:61-285``).
    """
    p = params["params"] if "params" in params else params
    m = p["model"]
    out: Dict[str, np.ndarray] = {}

    def put(k, v):
        out[k] = np.ascontiguousarray(np.asarray(v, np.float32))

    put("model.embed_tokens.weight", m["embed_tokens"])
    for i in range(cfg.num_hidden_layers):
        layer = m[f"layers_{i}"]
        pre = f"model.layers.{i}."
        for n in ("q", "k", "v", "o"):
            put(pre + f"self_attn.{n}_proj.weight",
                np.asarray(layer["self_attn"][f"{n}_proj"]["kernel"]).T)
        for n in ("gate", "up", "down"):
            put(pre + f"mlp.{n}_proj.weight",
                np.asarray(layer["mlp"][f"{n}_proj"]["kernel"]).T)
        put(pre + "input_layernorm.weight",
            layer["input_layernorm"]["scale"])
        put(pre + "post_attention_layernorm.weight",
            layer["post_attention_layernorm"]["scale"])
    put("model.norm.weight", m["norm"]["scale"])
    if cfg.tie_word_embeddings:
        put("lm_head.weight", m["embed_tokens"])
    else:
        put("lm_head.weight", np.asarray(p["lm_head"]["kernel"]).T)
    return out


def export_opt_state_dict(params, cfg: OPTConfig) -> Dict[str, np.ndarray]:
    """OPTForCausalLM params → HF-named numpy state dict.

    Inverse of :func:`convert_opt` — lets a model trained/quantized in
    this framework be loaded into ``transformers.OPTForCausalLM`` (e.g.
    for differential testing against the reference torch pipeline,
    ``llm/opt.py:25-252``).
    """
    p = params["params"] if "params" in params else params
    out: Dict[str, np.ndarray] = {}

    def put(k, v):
        out["model." + k] = np.ascontiguousarray(np.asarray(v, np.float32))

    put("decoder.embed_tokens.weight", p["embed_tokens"])
    put("decoder.embed_positions.weight", p["embed_positions"])
    for i in range(cfg.num_hidden_layers):
        pre = f"decoder.layers.{i}."
        layer = p[f"layers_{i}"]
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            put(pre + f"self_attn.{n}.weight",
                np.asarray(layer["self_attn"][n]["kernel"]).T)
            put(pre + f"self_attn.{n}.bias", layer["self_attn"][n]["bias"])
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            put(pre + f"{ln}.weight", layer[ln]["scale"])
            put(pre + f"{ln}.bias", layer[ln]["bias"])
        for fc in ("fc1", "fc2"):
            put(pre + f"{fc}.weight", np.asarray(layer[fc]["kernel"]).T)
            put(pre + f"{fc}.bias", layer[fc]["bias"])
    if cfg.do_layer_norm_before:
        put("decoder.final_layer_norm.weight", p["final_layer_norm"]["scale"])
        put("decoder.final_layer_norm.bias", p["final_layer_norm"]["bias"])
    if cfg.tie_word_embeddings:
        out["lm_head.weight"] = out["model.decoder.embed_tokens.weight"]
    elif "lm_head" in p:
        out["lm_head.weight"] = np.ascontiguousarray(
            np.asarray(p["lm_head"]["kernel"]).T)
    return out
