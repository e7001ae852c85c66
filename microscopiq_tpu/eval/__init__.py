"""Evaluation harnesses: data loaders, perplexity, GSM8K-CoT, benchmarks."""

from .data import get_loaders, synthetic_corpus  # noqa: F401
from .ppl import perplexity  # noqa: F401
