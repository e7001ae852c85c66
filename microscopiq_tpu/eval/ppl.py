"""Perplexity evaluation.

Parity target: ``llm/llama.py:175-285`` (``llama_eval``) /
``llm/opt.py:130-252``: split the test token stream into seqlen windows,
forward each window, cross-entropy of shifted logits, and
``ppl = exp(Σ nll / (nsamples · seqlen))``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def perplexity(apply_fn: Callable, params, test_ids: np.ndarray,
               seqlen: int = 2048, batch: int = 1,
               verbose: bool = False) -> float:
    """apply_fn(params, ids) -> logits (B, S, V)."""
    test_ids = np.asarray(test_ids)
    nsamples = len(test_ids) // seqlen
    if nsamples == 0:
        raise ValueError(f"test stream shorter than seqlen={seqlen}")

    @jax.jit
    def window_nll(params, ids):
        logits = apply_fn(params, ids)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tgt = ids[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return nll.sum()

    total = 0.0
    for b0 in range(0, nsamples, batch):
        nb = min(batch, nsamples - b0)
        ids = np.stack([test_ids[(b0 + j) * seqlen:(b0 + j + 1) * seqlen]
                        for j in range(nb)])
        total += float(window_nll(params, jnp.asarray(ids)))
        if verbose:
            done = (b0 + nb) * seqlen
            print(f"  {b0 + nb}/{nsamples} windows, "
                  f"running ppl {np.exp(total / ((b0 + nb) * (seqlen - 1))):.4f}")

    # reference normalizes by nsamples * seqlen (llama.py:281); we count
    # actual predicted tokens (seqlen - 1 per window)
    return float(np.exp(total / (nsamples * (seqlen - 1))))


def main(argv=None):
    """Thin CLI: `python -m microscopiq_tpu.eval.ppl --model tiny-opt`
    delegates to the full driver (cli/llm_cli.py). Accepts the model as
    either `--model X` or a positional; `opt-tiny`/`llama-tiny` aliases
    normalize to the driver's `tiny-*` names."""
    import sys

    args = list(sys.argv[1:] if argv is None else argv)
    if "--model" in args:
        i = args.index("--model")
        args = args[:i] + args[i + 1:i + 2] + args[i + 2:]
    alias = {"opt-tiny": "tiny-opt", "llama-tiny": "tiny-llama"}
    args = [alias.get(a, a) for a in args]

    from ..cli.llm_cli import main as cli_main

    return cli_main(args)


if __name__ == "__main__":
    main()
