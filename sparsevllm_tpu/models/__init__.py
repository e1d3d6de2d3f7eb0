"""Model registry: HF model_type -> (spec builder, weight loader).

Mirrors the reference's model_type switch (model_runner.py:134-161). All dense
architectures share the generic scan decoder (transformer.py); per-arch
modules declare the spec quirks and cite their reference counterparts.
"""

from __future__ import annotations

from .spec import ModelSpec, spec_from_hf_config
from . import llama, qwen2, qwen3  # noqa: F401  (registration side effects)

SUPPORTED_MODEL_TYPES = ("llama", "qwen2", "qwen3", "qwen3_moe")

__all__ = ["ModelSpec", "spec_from_hf_config", "SUPPORTED_MODEL_TYPES"]
