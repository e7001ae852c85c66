"""Evaluation harnesses: data loaders, perplexity, GSM8K-CoT, benchmarks."""

from .cot_tasks import evaluate_cot_task, load_task  # noqa: F401
from .data import get_loaders, synthetic_corpus  # noqa: F401
from .ppl import perplexity  # noqa: F401
