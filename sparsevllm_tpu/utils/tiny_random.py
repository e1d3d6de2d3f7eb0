"""Tiny randomly-initialized debug models.

Re-expresses the reference keystone debug pattern
(src/sparsevllm/debug/tiny_random.py + tests/test_tiny_random.py and
docs/features/tiny-random-debug.md): a seeded tiny HF model is built in torch,
its weights converted to the engine's layout, and engine logits are compared
against the HF model teacher-forced on CPU. Parity is then weight-exact and
isolates numerics of the engine's attention/cache path.
"""

from __future__ import annotations

from ..models.spec import ModelSpec, spec_from_hf_config

DEFAULT_TINY_CONFIG: dict = {
    "model_type": "llama",
    "hidden_size": 64,
    "intermediate_size": 128,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 16,
    "vocab_size": 512,
    "max_position_embeddings": 4096,
    "rms_norm_eps": 1e-6,
    "rope_theta": 10000.0,
    "tie_word_embeddings": False,
}

# keys a tiny_random_config override may change (whitelist, mirrors
# reference tiny_random.py:15-27 fail-fast on unknown overrides).
_OVERRIDE_WHITELIST = frozenset(
    list(DEFAULT_TINY_CONFIG) + [
        "num_experts", "num_experts_per_tok", "moe_intermediate_size",
        "rope_scaling",
        # hybrid (qwen3_next) keys
        "layer_types", "linear_num_value_heads", "linear_num_key_heads",
        "linear_key_head_dim", "linear_value_head_dim",
        "linear_conv_kernel_dim", "partial_rotary_factor",
        "decoder_sparse_step", "mlp_only_layers",
        "shared_expert_intermediate_size",
    ]
)


def tiny_config(overrides: dict | None = None) -> dict:
    cfg = dict(DEFAULT_TINY_CONFIG)
    for k, v in (overrides or {}).items():
        if k not in _OVERRIDE_WHITELIST:
            raise ValueError(
                f"tiny_random override {k!r} not in whitelist "
                f"{sorted(_OVERRIDE_WHITELIST)}"
            )
        cfg[k] = v
    return cfg


def build_tiny_hf_model(config: dict, seed: int):
    """Build the seeded torch HF model; returns (hf_config, torch_model)."""
    import torch
    import transformers

    cfg = dict(config)
    model_type = cfg.pop("model_type")
    cls_map = {
        "llama": (transformers.LlamaConfig, transformers.LlamaForCausalLM),
        "qwen2": (transformers.Qwen2Config, transformers.Qwen2ForCausalLM),
        "qwen3": (transformers.Qwen3Config, transformers.Qwen3ForCausalLM),
        "qwen3_moe": (
            transformers.Qwen3MoeConfig, transformers.Qwen3MoeForCausalLM,
        ),
        "qwen3_next": (
            transformers.Qwen3NextConfig, transformers.Qwen3NextForCausalLM,
        ),
    }
    if model_type not in cls_map:
        raise ValueError(f"tiny_random unsupported for {model_type!r}")
    cfg_cls, model_cls = cls_map[model_type]
    hf_config = cfg_cls(**cfg)
    hf_config.model_type = model_type
    torch.manual_seed(seed)
    with torch.no_grad():
        model = model_cls(hf_config).eval().to(torch.float32)
    return hf_config, model


def build_tiny_params_and_spec(
    config: dict | None, seed: int, dtype: str
) -> tuple[dict, ModelSpec]:
    """Returns (params, spec) for the engine, converted from the HF model."""
    from ..models.weights import params_from_torch_state_dict

    cfg = tiny_config(config)
    hf_config, model = build_tiny_hf_model(cfg, seed)
    spec = spec_from_hf_config(hf_config)
    if getattr(spec, "model_type", "") == "qwen3_next":
        from ..models.qwen3_next import params_from_hf_state_dict

        params = params_from_hf_state_dict(spec, model.state_dict(), dtype)
    else:
        params = params_from_torch_state_dict(
            spec, model.state_dict(), dtype
        )
    return params, spec
