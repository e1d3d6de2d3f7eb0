"""Public runtime-parameter normalization.

Re-expresses the reference contract (src/deltakv/configs/runtime_params.py:17-230
and docs/configuration/runtime-parameter-semantics.md): users pass *public
canonical* parameter names; aliases are normalized, legacy/renamed keys are
rejected with an actionable error, and unknown keys are a hard error unless
``allow_unknown_config_keys`` is set (reference llm_engine.py:175-184).
"""

from __future__ import annotations

from typing import Any

from .method_registry import normalize_method

# public canonical name -> internal Config field name.
_PUBLIC_TO_INTERNAL: dict[str, str] = {
    "sparse_method": "method",
    "decode_keep_tokens": "decode_keep_tokens",
    "sink_keep_tokens": "num_sink_tokens",
    "recent_keep_tokens": "num_recent_tokens",
    "prefill_keep_tokens": "prefill_keep_tokens",
    "full_attention_layers": "full_attn_layers",
    "engine_prefill_chunk_size": "chunk_prefill_size",
    "deltakv_checkpoint_path": "deltakv_checkpoint_path",
}

# convenience aliases (accepted, normalized to canonical public names).
_ALIASES: dict[str, str] = {
    "method": "sparse_method",
    "prefill_chunk_size": "engine_prefill_chunk_size",
    "full_attn_layers": "full_attention_layers",
}

# legacy keys from older reference releases: rejected with a pointer to the
# replacement (reference runtime_params.py:44-75 rejects legacy names).
_LEGACY_REJECTED: dict[str, str] = {
    "num_sink_tokens": "sink_keep_tokens",
    "num_recent_tokens": "recent_keep_tokens",
    "sparse_attn_method": "sparse_method",
    "kv_keep_ratio": "prefill_keep_tokens (absolute count, not a ratio)",
    "chunk_size": "engine_prefill_chunk_size",
    "hf_prefill_chunk_size": "engine_prefill_chunk_size (engine backend)",
}


def normalize_runtime_params(
    kwargs: dict[str, Any],
    allow_unknown: bool = False,
) -> dict[str, Any]:
    """Map public kwargs to internal Config field names.

    Keys already matching internal Config fields pass through; public
    canonical names are translated; legacy names raise; unknown names raise
    unless ``allow_unknown`` (then they pass through for Config to reject or
    absorb).
    """
    from .config import Config  # local import to avoid cycle

    config_fields = set(Config.field_names())
    out: dict[str, Any] = {}
    for key, value in kwargs.items():
        if key in _LEGACY_REJECTED:
            raise ValueError(
                f"Runtime parameter {key!r} is a legacy name; use "
                f"{_LEGACY_REJECTED[key]!r} instead."
            )
        canonical = _ALIASES.get(key, key)
        internal = _PUBLIC_TO_INTERNAL.get(canonical, canonical)
        if internal not in config_fields:
            if not allow_unknown:
                raise ValueError(
                    f"Unknown runtime parameter {key!r}. Set "
                    f"allow_unknown_config_keys=True to bypass (not "
                    f"recommended; typos silently change behavior)."
                )
            continue
        if internal in out and out[internal] != value:
            raise ValueError(
                f"Conflicting values for parameter {internal!r} "
                f"(given via multiple aliases)."
            )
        out[internal] = value
    if "method" in out:
        out["method"] = normalize_method(out["method"])
    return out
