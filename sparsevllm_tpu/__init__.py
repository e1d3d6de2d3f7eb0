"""sparsevllm_tpu: TPU-native sparse-first LLM inference engine.

Brand-new JAX/XLA/Pallas re-design with the capabilities of
CURRENTF/Sparse-vLLM (see SURVEY.md at the repo root for the blueprint).
"""

import os as _os

from .config import Config
from .sampling_params import SamplingParams

__version__ = "0.1.0"


def _raise_scoped_vmem_limit() -> None:
    """v5e has 128 MiB VMEM per core but XLA's default scoped-vmem budget is
    16 MiB, which forces tiny query tiles in the prefill kernels (every
    S-block re-streams the whole context: tile size is inversely
    proportional to prefill HBM traffic). 64 MiB verified working on-chip.

    Must run before the TPU plugin initializes (args are snapshotted)."""
    if "scoped_vmem" not in _os.environ.get("LIBTPU_INIT_ARGS", ""):
        _os.environ["LIBTPU_INIT_ARGS"] = (
            _os.environ.get("LIBTPU_INIT_ARGS", "")
            + " --xla_tpu_scoped_vmem_limit_kib=65536"
        ).strip()


_raise_scoped_vmem_limit()


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (measured: a 128K prefill bucket
    compiles in 60-120 s through the TPU tunnel; warm-cache loads are
    <100 ms). Set SPARSEVLLM_TPU_CACHE_DIR to relocate, or empty to
    disable."""
    if _os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # CPU-only runs (tests, parity scripts): the axon stack AOT-compiles
        # CPU executables with the server's machine features — cached
        # entries loaded on a different host risk SIGILL. TPU executables
        # have no such mismatch.
        return
    path = _os.environ.get(
        "SPARSEVLLM_TPU_CACHE_DIR",
        _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache"),
    )
    if not path:
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          _os.path.abspath(path))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass


_enable_compilation_cache()


def __getattr__(name):
    # lazy: importing LLM pulls in jax; keep config-only imports cheap.
    if name in ("LLM", "LLMEngine", "RequestOutput"):
        from .engine import llm_engine

        return getattr(llm_engine, name)
    raise AttributeError(name)


__all__ = ["LLM", "LLMEngine", "RequestOutput", "Config", "SamplingParams"]
