"""Calibration / evaluation data loaders.

Parity target: ``utils/data_utils.py:12-205`` (``get_loaders`` for
wikitext2/ptb/c4/pile with seeded random seqlen crops).

This environment has no network access, so datasets resolve in order:
1. a local HF-datasets directory under ``$MICROSCOPIQ_DATA_DIR/<name>``,
2. a plain text file ``$MICROSCOPIQ_DATA_DIR/<name>.txt``,
3. the built-in deterministic synthetic corpus (name ``synthetic`` always
   uses it) — for pipeline tests, not for reportable perplexities.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

DATA_DIR = os.environ.get("MICROSCOPIQ_DATA_DIR", "/root/data")

_WORDS = (
    "the of and to in a is that for it as was with be by on not he this are "
    "or his from at which but have an had they you were their one all we can "
    "her has there been if more when will would who so no out up into do "
    "time two like only some could them see other than then now look over "
    "its new take state years quantization tensor block scale exponent "
    "outlier weight matrix model language compute memory cache token "
    "attention layer hidden gradient hessian inverse cholesky pipeline "
    "hardware accelerator systolic butterfly network precision mantissa"
).split()


def synthetic_corpus(n_tokens_approx: int = 600_000, seed: int = 1234) -> str:
    """Deterministic zipf-ish text corpus for offline pipeline tests."""
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, len(_WORDS) + 1)
    probs = (1.0 / ranks) / np.sum(1.0 / ranks)
    words = rng.choice(np.asarray(_WORDS), size=n_tokens_approx, p=probs)
    out, line = [], []
    for w in words:
        line.append(w)
        if len(line) >= int(rng.integers(8, 25)):
            out.append(" ".join(line) + ".")
            line = []
    return "\n".join(out)


def _load_text(name: str, allow_synthetic: bool = False) -> str:
    path_dir = os.path.join(DATA_DIR, name)
    path_txt = os.path.join(DATA_DIR, f"{name}.txt")
    if os.path.isdir(path_dir):
        try:
            import datasets
            ds = datasets.load_from_disk(path_dir)
            col = "text" if "text" in ds.column_names else ds.column_names[0]
            return "\n\n".join(ds[col])
        except Exception:
            pass
    if os.path.isfile(path_txt):
        with open(path_txt) as f:
            return f.read()
    if name != "synthetic":
        # a reportable run must never silently print a synthetic ppl as
        # if it were the real corpus (a typo'd MICROSCOPIQ_DATA_DIR used
        # to produce a confident, meaningless number)
        if not (allow_synthetic
                or os.environ.get("MICROSCOPIQ_ALLOW_SYNTHETIC")):
            raise FileNotFoundError(
                f"dataset '{name}' not found under {DATA_DIR}. Place the "
                f"corpus at {path_dir}/ (HF datasets.save_to_disk) or "
                f"{path_txt}, or pass --allow-synthetic / set "
                "MICROSCOPIQ_ALLOW_SYNTHETIC=1 to fall back to the "
                "synthetic corpus (perplexities NOT comparable)")
        import warnings
        warnings.warn(
            f"dataset '{name}' not found under {DATA_DIR}; falling back to "
            "the synthetic corpus (perplexities are NOT comparable)")
    return synthetic_corpus()


def get_loaders(name: str, nsamples: int = 128, seed: int = 0,
                seqlen: int = 2048, tokenizer=None,
                allow_synthetic: bool = False
                ) -> Tuple[List[np.ndarray], np.ndarray]:
    """(train crops, test token stream), reference get_loaders semantics:
    seeded random seqlen crops from the train split; the full test split
    tokenized as one stream.

    tokenizer: anything with encode() -> list[int]; None uses a hash
    tokenizer (synthetic pipelines only).
    """
    text = _load_text(name, allow_synthetic)
    split = int(len(text) * 0.9)
    train_text, test_text = text[:split], text[split:]

    if tokenizer is None:
        tokenize = _hash_tokenize
    else:
        tokenize = lambda s: np.asarray(tokenizer.encode(s), np.int32)

    train_ids = tokenize(train_text)
    test_ids = tokenize(test_text)

    rng = np.random.default_rng(seed)
    crops = []
    for _ in range(nsamples):
        if len(train_ids) <= seqlen + 1:
            start = 0
        else:
            start = int(rng.integers(0, len(train_ids) - seqlen - 1))
        crops.append(train_ids[start:start + seqlen][None, :])
    return crops, test_ids


def _hash_tokenize(text: str, vocab_size: int = 256) -> np.ndarray:
    """Word-hash tokenizer for synthetic pipelines.

    Uses a deterministic hash: the builtin ``hash()`` is salted per
    process (PYTHONHASHSEED), which made perplexities differ run to run.
    """
    import zlib

    toks = [zlib.crc32(w.encode()) % (vocab_size - 2) + 2
            for w in text.split()]
    return np.asarray(toks, np.int32)
