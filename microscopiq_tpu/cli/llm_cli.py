"""LLM quantization CLI — the analog of the reference drivers
(``llm/llama.py:288-379``, ``llm/opt.py:381-512``): GPTQ-calibrate a model
with the MX-outlier quantizer (or RTN with --nearest), evaluate
perplexity, benchmark per-token decode latency, save/load packed
checkpoints.

Offline model resolution: --model may be a local HF checkpoint directory
(config.json + safetensors/bin) or one of the built-in synthetic configs
(tiny-opt, tiny-llama) for pipeline runs without network access.

Usage:
  python -m microscopiq_tpu.cli.llm_cli tiny-opt synthetic \\
      --inlier-format int2 --outlier-format fp4_e2m1 --block-size 16
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_model(name: str):
    import jax
    import jax.numpy as jnp
    from ..models import (LlamaConfig, LlamaForCausalLM, OPTConfig,
                          OPTForCausalLM, convert_llama, convert_opt,
                          load_hf_state_dict)

    if name == "tiny-opt":
        cfg = OPTConfig.tiny()
        model = OPTForCausalLM(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 8), jnp.int32))
        return "opt", cfg, model, params, None
    if name == "tiny-llama":
        cfg = LlamaConfig.tiny()
        model = LlamaForCausalLM(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 8), jnp.int32))
        return "llama", cfg, model, params, None

    # local HF checkpoint directory
    with open(os.path.join(name, "config.json")) as f:
        hf = json.load(f)
    arch = (hf.get("architectures") or [""])[0].lower()
    state = load_hf_state_dict(name)
    tokenizer = None
    try:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(name)
    except Exception:
        pass
    if "opt" in arch:
        cfg = OPTConfig(
            vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
            ffn_dim=hf["ffn_dim"], num_hidden_layers=hf["num_hidden_layers"],
            num_attention_heads=hf["num_attention_heads"],
            max_position_embeddings=hf["max_position_embeddings"],
            do_layer_norm_before=hf.get("do_layer_norm_before", True))
        return ("opt", cfg, OPTForCausalLM(cfg), convert_opt(state, cfg),
                tokenizer)
    cfg = LlamaConfig(
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        num_key_value_heads=hf.get("num_key_value_heads",
                                   hf["num_attention_heads"]),
        max_position_embeddings=hf["max_position_embeddings"],
        rope_theta=hf.get("rope_theta", 10000.0),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        sliding_window=hf.get("sliding_window"),
        num_local_experts=hf.get("num_local_experts", 0),
        tie_word_embeddings=hf.get("tie_word_embeddings", False))
    return ("llama", cfg, LlamaForCausalLM(cfg), convert_llama(state, cfg),
            tokenizer)


def benchmark_decode(model, params, cfg, n_tokens: int = 64,
                     batch: int = 1) -> float:
    """Median per-token decode latency (llm/opt.py:332-378 analog)."""
    from ..eval.generate import generate
    prompt = np.zeros((batch, 8), np.int64)
    generate(model, params, prompt, max_new_tokens=4)  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        generate(model, params, prompt, max_new_tokens=n_tokens)
        times.append((time.perf_counter() - t0) / n_tokens)
    return float(np.median(times))


def main(argv=None):
    from ..specs import add_mx_args

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("model", help="local HF dir | tiny-opt | tiny-llama")
    parser.add_argument("dataset", nargs="?", default="synthetic",
                        choices=["wikitext2", "ptb", "c4", "synthetic"])
    parser.add_argument("--nsamples", type=int, default=128)
    parser.add_argument("--seqlen", type=int, default=2048)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--nearest", action="store_true",
                        help="RTN instead of GPTQ (llama.py:226-253)")
    parser.add_argument("--inlier-format", default="int2")
    parser.add_argument("--outlier-format", default="fp4_e2m1")
    parser.add_argument("--inlier-scale-bits", type=int, default=8)
    parser.add_argument("--outlier-scale-bits", type=int, default=8)
    parser.add_argument("--quant-block-size", type=int, default=16)
    parser.add_argument("--std-dev", type=float, default=2.0)
    parser.add_argument("--percdamp", type=float, default=0.01)
    parser.add_argument("--blocksize", type=int, default=128)
    parser.add_argument("--act-order", action="store_true")
    parser.add_argument("--no-quant", action="store_true")
    parser.add_argument("--allow-synthetic", action="store_true",
                        help="permit silent fallback to the synthetic "
                             "corpus when the dataset dir is missing")
    parser.add_argument("--benchmark", type=int, default=0,
                        help="decode-latency benchmark over N tokens")
    parser.add_argument("--save", default="",
                        help="save packed checkpoint to this dir")
    parser.add_argument("--load", default="",
                        help="load packed checkpoint from this dir")
    add_mx_args(parser)
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    from ..eval import get_loaders, perplexity
    from ..quant import MXQuantizer
    from ..quant.calibrate import gptq_quantize_model
    from ..specs import finalize_mx_specs
    from ..nn import quantize_params

    kind, cfg, model, params, tokenizer = build_model(args.model)
    seqlen = min(args.seqlen, cfg.max_position_embeddings)

    crops, test_ids = get_loaders(args.dataset, args.nsamples, args.seed,
                                  seqlen, tokenizer,
                                  allow_synthetic=args.allow_synthetic)
    calib = jnp.asarray(np.concatenate(crops, 0) % cfg.vocab_size)
    test_ids = np.asarray(test_ids) % cfg.vocab_size

    if args.load:
        from ..utils.checkpoint import load_checkpoint
        params = load_checkpoint(args.load)
        print(f"loaded packed checkpoint from {args.load}")
    elif not args.no_quant:
        t0 = time.time()
        if args.nearest:
            specs = finalize_mx_specs({
                "w_elem_format": args.inlier_format,
                "w_outlier_elem_format": args.outlier_format,
                "scale_bits": args.inlier_scale_bits,
                "block_size": args.quant_block_size,
                "outlier_std_dev": args.std_dev, "bfloat": 16})
            params = {"params": quantize_params(params["params"], specs)}
            print(f"RTN quantization done in {time.time() - t0:.1f}s")
        else:
            qz = MXQuantizer()
            qz.configure(args.inlier_scale_bits, args.outlier_scale_bits,
                         args.inlier_format, args.outlier_format,
                         std_dev=args.std_dev, axes=[0],
                         block_size=args.quant_block_size)
            params = gptq_quantize_model(
                kind, cfg, params, calib, quantizer=qz,
                blocksize=args.blocksize, percdamp=args.percdamp,
                actorder=args.act_order)
            print(f"GPTQ calibration done in {time.time() - t0:.1f}s")

    if args.save:
        from ..utils.checkpoint import save_checkpoint
        save_checkpoint(args.save, params)
        print(f"saved checkpoint to {args.save}")

    apply_fn = lambda p, ids: model.apply(p, ids)
    ppl = perplexity(apply_fn, params, test_ids, seqlen=seqlen,
                     batch=1, verbose=True)
    print(f"{args.dataset} perplexity: {ppl:.4f}")

    if args.benchmark:
        lat = benchmark_decode(model, params, cfg, args.benchmark)
        print(f"median decode latency: {lat * 1e3:.2f} ms/token "
              f"({1 / lat:.1f} tokens/s)")


if __name__ == "__main__":
    main()
