"""Utilities: profilers, model helpers, checkpoint IO, observability."""

from .profiling import (  # noqa: F401
    analyze_outliers,
    format_mse_profile,
    profile_model_outliers,
)
