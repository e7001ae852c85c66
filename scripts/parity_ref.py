"""Model-scale accuracy-parity harness vs the reference torch pipeline.

The north-star check (BASELINE.md / VERDICT round-1 item 1): construct one
small OPT, give BOTH stacks the SAME weights + the SAME calibration and
eval token streams, run

  * the reference pipeline: ``opt_sequential`` + ``opt_eval``
    (/root/reference/llm/opt.py:25-252, llm/gptq.py:60-184) on torch CPU,
  * this repo's pipeline: ``gptq_quantize_model`` + ``perplexity``,

in the canonical int2+fp4/block-16 config (llm/opt.py:87-94) and the
MX-FP6 RTN config (weights-only `_quantize_mx`, block 32), and record both
perplexities per config. Done = |Δppl| ≤ 0.1.

Stages (run as separate processes — the TPU tunnel tolerates ONE process):
  python scripts/parity_ref.py prepare    # train a small OPT (TPU ok)
  python scripts/parity_ref.py reference  # torch-CPU reference pipeline
  python scripts/parity_ref.py ours       # JAX-CPU our pipeline
  python scripts/parity_ref.py report     # merge -> PARITY_r02.json

Artifacts live in parity/ (gitignored, ~80 MB); only the report is
committed.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
ART = os.path.join(REPO, "parity")
sys.path.insert(0, REPO)

# small-OPT geometry: 125M-style block shape, fewer layers, small vocab so
# the model trains to structure in minutes on one chip. When only the CPU
# is reachable, prepare falls back to the smaller geometry; the chosen one
# is persisted in parity/config.json and read back by later stages.
MODEL_TPU = dict(vocab_size=4096, hidden_size=512, ffn_dim=2048,
                 num_hidden_layers=6, num_attention_heads=8,
                 max_position_embeddings=512)
MODEL_CPU = dict(vocab_size=4096, hidden_size=256, ffn_dim=1024,
                 num_hidden_layers=6, num_attention_heads=8,
                 max_position_embeddings=512)
SEQLEN = 256
NSAMPLES = 16          # calibration crops (reference default 128; scaled)
EVAL_WINDOWS = 32
TRAIN_STEPS = 800
TRAIN_BATCH = 16


def load_model_cfg() -> dict:
    with open(os.path.join(ART, "config.json")) as f:
        return json.load(f)

# canonical GPTQ config, llm/opt.py:87-94
GPTQ_CFG = dict(inlier="int2", outlier="fp4_e2m1", scale_bits=8,
                block_size=16, std_dev=2, percdamp=0.01, blocksize=128)
# MX-FP6 serving config (examples/run_mx_fp6.sh elem format, serving
# block 32 / scale 8 as benched)
FP6_CFG = dict(fmt="fp6_e3m2", scale_bits=8, block_size=32)


def markov_stream(n_tokens: int, vocab: int, seed: int = 7,
                  branching: int = 24) -> np.ndarray:
    """Deterministic order-1 Markov corpus: every token has `branching`
    plausible successors with Zipf weights — structured enough for a small
    LM to learn, so quantization error moves perplexity measurably."""
    rng = np.random.default_rng(seed)
    succ = rng.integers(0, vocab, size=(vocab, branching))
    ranks = np.arange(1, branching + 1)
    probs = (1.0 / ranks) / np.sum(1.0 / ranks)
    cols = rng.choice(branching, size=n_tokens, p=probs)
    out = np.empty(n_tokens, np.int32)
    cur = int(rng.integers(0, vocab))
    for i in range(n_tokens):
        cur = int(succ[cur, cols[i]])
        out[i] = cur
    return out


def make_tokens(model_cfg):
    """Train / calib / eval splits from one seeded Markov stream."""
    V = model_cfg["vocab_size"]
    stream = markov_stream(2_200_000, V, seed=7)
    train = stream[:2_000_000]
    rng = np.random.default_rng(0)  # reference seeds crops (data_utils.py)
    tail = stream[2_000_000:]
    starts = rng.integers(0, len(tail) - SEQLEN - 1, size=NSAMPLES)
    calib = np.stack([tail[s:s + SEQLEN] for s in starts])
    eval_ids = tail[-(EVAL_WINDOWS * SEQLEN + 1):-1]
    return train, calib, eval_ids


# ---------------------------------------------------------------------------
# stage: prepare — train the flax OPT, export HF-named weights
# ---------------------------------------------------------------------------
def stage_prepare():
    import jax
    import jax.numpy as jnp
    import optax

    from microscopiq_tpu.models import OPTConfig, OPTForCausalLM
    from microscopiq_tpu.models.loading import export_opt_state_dict

    os.makedirs(ART, exist_ok=True)
    on_tpu = jax.default_backend() not in ("cpu",)
    model_cfg = MODEL_TPU if on_tpu else MODEL_CPU
    steps = TRAIN_STEPS if on_tpu else TRAIN_STEPS // 2
    print(f"backend={jax.default_backend()} model={model_cfg} "
          f"steps={steps}", flush=True)
    with open(os.path.join(ART, "config.json"), "w") as f:
        json.dump(model_cfg, f)
    train, calib, eval_ids = make_tokens(model_cfg)
    np.savez(os.path.join(ART, "tokens.npz"), calib=calib, eval=eval_ids)

    cfg = OPTConfig(**model_cfg)
    model = OPTForCausalLM(cfg, use_pallas=False)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, SEQLEN), jnp.int32))

    tx = optax.adamw(optax.cosine_decay_schedule(1e-3, steps, 0.1),
                     weight_decay=0.01)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, ids):
        def loss_fn(p):
            logits = model.apply(p, ids)
            logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
            nll = -jnp.take_along_axis(logp, ids[:, 1:, None], -1)
            return nll.mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(1)
    n_crops = len(train) // SEQLEN
    import time
    t0 = time.time()
    for i in range(steps):
        idx = rng.integers(0, n_crops, TRAIN_BATCH)
        ids = jnp.asarray(np.stack(
            [train[j * SEQLEN:(j + 1) * SEQLEN] for j in idx]))
        params, opt_state, loss = step(params, opt_state, ids)
        if i % 50 == 0 or i == steps - 1:
            print(f"step {i}: loss {float(loss):.4f} "
                  f"(ppl {float(np.exp(loss)):.1f}) "
                  f"[{time.time() - t0:.0f}s]", flush=True)

    state = export_opt_state_dict(jax.device_get(params), cfg)
    np.savez(os.path.join(ART, "weights.npz"), **state)
    print("saved", os.path.join(ART, "weights.npz"))


# ---------------------------------------------------------------------------
# stage: reference — torch CPU, /root/reference pipeline verbatim
# ---------------------------------------------------------------------------
def _load_hf_model():
    import torch
    from transformers import OPTConfig as HFOPTConfig
    from transformers import OPTForCausalLM as HFOPT

    MODEL = load_model_cfg()
    cfg = HFOPTConfig(
        vocab_size=MODEL["vocab_size"], hidden_size=MODEL["hidden_size"],
        ffn_dim=MODEL["ffn_dim"],
        num_hidden_layers=MODEL["num_hidden_layers"],
        num_attention_heads=MODEL["num_attention_heads"],
        max_position_embeddings=MODEL["max_position_embeddings"],
        word_embed_proj_dim=MODEL["hidden_size"],
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        attn_implementation="eager")
    m = HFOPT(cfg)
    state = np.load(os.path.join(ART, "weights.npz"))
    sd = {k: torch.from_numpy(state[k]) for k in state.files}
    missing, unexpected = m.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all("lm_head" in k or "rotary" in k for k in missing), missing
    m = m.float().eval()
    m.seqlen = SEQLEN
    return m


def _ref_eval_ppl(opt_mod, model, eval_ids):
    """Run reference opt_eval and scrape the printed perplexity."""
    import torch

    class Enc:  # opt_eval wants .input_ids
        pass

    enc = Enc()
    enc.input_ids = torch.from_numpy(
        np.asarray(eval_ids[None, :], np.int64))
    # reference bug shim: opt_eval reads `decoder.layers.final_layer_norm`
    # (llm/opt.py:239) — on an nn.ModuleList that attribute doesn't exist.
    # Alias the real final_layer_norm there so the reference's intended
    # semantics (GPTQ-original opt.py) execute unchanged.
    dec = model.model.decoder
    # object.__setattr__ bypasses nn.Module registration — a plain
    # setattr would add the norm to the ModuleList's _modules and grow
    # len(layers) by one, corrupting opt_eval's layer loop
    object.__setattr__(dec.layers, "final_layer_norm",
                       dec.final_layer_norm)
    buf = io.StringIO()
    from contextlib import redirect_stdout
    with redirect_stdout(buf):
        opt_mod.opt_eval(model, enc, torch.device("cpu"))
    object.__delattr__(dec.layers, "final_layer_norm")
    floats = [l for l in buf.getvalue().splitlines()
              if re.fullmatch(r"[0-9]+\.[0-9]+(e[+-]?\d+)?", l.strip())]
    assert floats, buf.getvalue()[-2000:]
    return float(floats[-1])


def stage_reference():
    import torch
    from types import SimpleNamespace

    for p in (REF, os.path.join(REF, "llm"),
              os.path.join(REF, "number_system")):
        sys.path.insert(0, p)
    import opt as ref_opt  # /root/reference/llm/opt.py

    if not torch.cuda.is_available():
        # fasterquant unconditionally calls cuda.synchronize (gptq.py:173)
        torch.cuda.synchronize = lambda *a, **k: None

    args = SimpleNamespace(nsamples=NSAMPLES, percdamp=GPTQ_CFG["percdamp"],
                           groupsize=-1, act_order=False,
                           static_groups=False, nearest=False, use_mx=True)
    ref_opt.args = args
    import gptq as ref_gptq
    ref_gptq.args = args

    tok = np.load(os.path.join(ART, "tokens.npz"))
    calib, eval_ids = tok["calib"], tok["eval"]
    loader = [(torch.from_numpy(np.asarray(c[None, :], np.int64)), None)
              for c in calib]
    dev = torch.device("cpu")
    results = {}

    # dense baseline
    model = _load_hf_model()
    results["dense_ppl"] = _ref_eval_ppl(ref_opt, model, eval_ids)
    print("ref dense ppl:", results["dense_ppl"], flush=True)

    # canonical GPTQ int2+fp4 block16 (opt_sequential verbatim)
    model = _load_hf_model()
    buf = io.StringIO()
    from contextlib import redirect_stdout
    with redirect_stdout(buf):
        ref_opt.opt_sequential(model, loader, dev)
    results["gptq_int2fp4_ppl"] = _ref_eval_ppl(ref_opt, model, eval_ids)
    print("ref gptq int2+fp4 ppl:", results["gptq_int2fp4_ppl"], flush=True)

    # MX-FP6 RTN: weights-only _quantize_mx on every decoder linear.
    # axes=[0] on torch (out, in) == our kernel's out axis (quantize_params
    # axes=[-1] on (in, out)) — the reference MXQuantizer block convention
    # (llm/opt.py:87-94 axes=[0]).
    from mx.mx_ops import _quantize_mx
    from utils.modelutils import find_layers
    model = _load_hf_model()
    for layer in model.model.decoder.layers:
        for name, lin in find_layers(layer).items():
            W = lin.weight.data.float()
            lin.weight.data = _quantize_mx(
                W, FP6_CFG["scale_bits"], FP6_CFG["fmt"], "max", [0],
                FP6_CFG["block_size"], "nearest", False, False)
    results["rtn_fp6_ppl"] = _ref_eval_ppl(ref_opt, model, eval_ids)
    print("ref fp6 rtn ppl:", results["rtn_fp6_ppl"], flush=True)

    with open(os.path.join(ART, "ref_results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


# ---------------------------------------------------------------------------
# stage: ours — JAX CPU, this repo's pipeline
# ---------------------------------------------------------------------------
def stage_ours():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from microscopiq_tpu.eval import perplexity
    from microscopiq_tpu.models import OPTConfig, OPTForCausalLM
    from microscopiq_tpu.models.loading import convert_opt
    from microscopiq_tpu.nn import pack_params, quantize_params
    from microscopiq_tpu.quant import MXQuantizer
    from microscopiq_tpu.quant.calibrate import gptq_quantize_model
    from microscopiq_tpu.specs import finalize_mx_specs

    cfg = OPTConfig(**load_model_cfg())
    model = OPTForCausalLM(cfg, use_pallas=False)
    state = dict(np.load(os.path.join(ART, "weights.npz")))
    params = convert_opt(state, cfg)
    tok = np.load(os.path.join(ART, "tokens.npz"))
    calib, eval_ids = jnp.asarray(tok["calib"]), tok["eval"]
    apply_fn = lambda p, ids: model.apply(p, ids)
    ppl = lambda p: perplexity(apply_fn, p, eval_ids, seqlen=SEQLEN,
                               batch=4)
    results = {}

    results["dense_ppl"] = ppl(params)
    print("ours dense ppl:", results["dense_ppl"], flush=True)

    qz = MXQuantizer()
    qz.configure(GPTQ_CFG["scale_bits"], GPTQ_CFG["scale_bits"],
                 GPTQ_CFG["inlier"], GPTQ_CFG["outlier"],
                 std_dev=GPTQ_CFG["std_dev"], axes=[0],
                 block_size=GPTQ_CFG["block_size"])
    # single group = the reference OPT driver's one-pass capture
    all_paths = [["self_attn/q_proj", "self_attn/k_proj",
                  "self_attn/v_proj", "self_attn/out_proj", "fc1", "fc2"]]
    gptq_params = gptq_quantize_model(
        "opt", cfg, params, calib, quantizer=qz,
        blocksize=GPTQ_CFG["blocksize"], percdamp=GPTQ_CFG["percdamp"],
        groups=all_paths, verbose=True)
    results["gptq_int2fp4_ppl"] = ppl(gptq_params)
    print("ours gptq int2+fp4 ppl:", results["gptq_int2fp4_ppl"],
          flush=True)

    specs_o = finalize_mx_specs({
        "w_elem_format": GPTQ_CFG["inlier"],
        "w_outlier_elem_format": GPTQ_CFG["outlier"],
        "scale_bits": GPTQ_CFG["scale_bits"],
        "block_size": GPTQ_CFG["block_size"], "bfloat": 16})
    packed = pack_params(gptq_params["params"], specs_o,
                         skip=("embed_tokens", "embed_positions",
                               "lm_head"), outlier_budget=4)
    results["gptq_int2fp4_packed_ppl"] = ppl({"params": packed})
    print("ours gptq packed ppl:", results["gptq_int2fp4_packed_ppl"],
          flush=True)

    specs6 = finalize_mx_specs({
        "w_elem_format": FP6_CFG["fmt"], "scale_bits":
        FP6_CFG["scale_bits"], "block_size": FP6_CFG["block_size"],
        "bfloat": 16})
    rtn_tree = quantize_params(params["params"], specs6,
                               skip=("embed_tokens", "embed_positions"))
    results["rtn_fp6_ppl"] = ppl({"params": rtn_tree})
    print("ours fp6 rtn ppl:", results["rtn_fp6_ppl"], flush=True)

    packed6 = pack_params(rtn_tree, specs6,
                          skip=("embed_tokens", "embed_positions",
                                "lm_head"))
    results["rtn_fp6_packed_ppl"] = ppl({"params": packed6})
    print("ours fp6 packed ppl:", results["rtn_fp6_packed_ppl"],
          flush=True)

    with open(os.path.join(ART, "our_results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


def stage_report():
    ref = json.load(open(os.path.join(ART, "ref_results.json")))
    ours = json.load(open(os.path.join(ART, "our_results.json")))
    report = {
        "model": load_model_cfg(), "seqlen": SEQLEN, "nsamples": NSAMPLES,
        "eval_windows": EVAL_WINDOWS,
        "configs": {
            "dense": {"ref_ppl": ref["dense_ppl"],
                      "our_ppl": ours["dense_ppl"]},
            "gptq_int2_fp4_block16": {
                "ref_ppl": ref["gptq_int2fp4_ppl"],
                "our_ppl": ours["gptq_int2fp4_ppl"],
                "our_packed_ppl": ours["gptq_int2fp4_packed_ppl"]},
            "rtn_mxfp6_block32": {
                "ref_ppl": ref["rtn_fp6_ppl"],
                "our_ppl": ours["rtn_fp6_ppl"],
                "our_packed_ppl": ours["rtn_fp6_packed_ppl"]},
        },
    }
    ok = True
    for name, c in report["configs"].items():
        c["delta"] = round(c["our_ppl"] - c["ref_ppl"], 6)
        c["pass"] = abs(c["delta"]) <= 0.1
        ok = ok and c["pass"]
        print(f"{name}: ref {c['ref_ppl']:.4f} ours {c['our_ppl']:.4f} "
              f"delta {c['delta']:+.4f} {'PASS' if c['pass'] else 'FAIL'}")
    report["pass"] = ok
    out = os.path.join(REPO, "PARITY_r02.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out, "PASS" if ok else "FAIL")
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["prepare", "reference", "ours",
                                      "report"])
    a = ap.parse_args()
    return {"prepare": stage_prepare, "reference": stage_reference,
            "ours": stage_ours, "report": stage_report}[a.stage]()


if __name__ == "__main__":
    sys.exit(main() or 0)
