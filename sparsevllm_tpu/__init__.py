"""sparsevllm_tpu: TPU-native sparse-first LLM inference engine.

Brand-new JAX/XLA/Pallas re-design with the capabilities of
CURRENTF/Sparse-vLLM (see SURVEY.md at the repo root for the blueprint).
"""

from .config import Config
from .sampling_params import SamplingParams

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: importing LLM pulls in jax; keep config-only imports cheap.
    if name in ("LLM", "LLMEngine", "RequestOutput"):
        from .engine import llm_engine

        return getattr(llm_engine, name)
    raise AttributeError(name)


__all__ = ["LLM", "LLMEngine", "RequestOutput", "Config", "SamplingParams"]
