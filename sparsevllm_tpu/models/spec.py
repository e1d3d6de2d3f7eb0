"""Model architecture specification.

``ModelSpec`` is the static description of a decoder-only transformer that the
functional forward (models/transformer.py) and the weight loader consume. One
generic decoder covers the reference's dense model zoo (llama / qwen2 / qwen3,
reference models/llama.py, qwen2.py, qwen3.py) — they differ only in qkv bias
and per-head q/k RMS norms; MoE and hybrid-linear-attention variants extend
this spec.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class ModelSpec:
    model_type: str
    num_layers: int
    hidden_size: int
    num_q_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: int
    vocab_size: int
    rms_norm_eps: float
    rope_theta: float
    max_position_embeddings: int
    rope_scaling: dict | None = None
    tie_word_embeddings: bool = False
    qk_norm: bool = False  # qwen3: per-head RMS norm on q and k
    attn_bias: bool = False  # qwen2: bias on q/k/v projections
    # MoE (qwen3_moe); 0 experts = dense MLP.
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    norm_topk_prob: bool = True

    @property
    def q_dim(self) -> int:
        return self.num_q_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim

    @property
    def gqa_groups(self) -> int:
        return self.num_q_heads // self.num_kv_heads

    @property
    def is_moe(self) -> bool:
        return self.num_experts > 0

    def __post_init__(self) -> None:
        if self.num_q_heads % self.num_kv_heads != 0:
            raise ValueError("num_q_heads must be a multiple of num_kv_heads")


def spec_from_hf_config(cfg: Any) -> ModelSpec:
    """Build a ModelSpec from an HF config object or plain dict."""
    get = (lambda k, d=None: cfg.get(k, d)) if isinstance(cfg, dict) else (
        lambda k, d=None: getattr(cfg, k, d)
    )
    model_type = get("model_type")
    if model_type == "qwen3_next":
        # hybrid full+linear attention (reference models/qwen3_5.py)
        from .qwen3_next import hybrid_spec_from_hf

        return hybrid_spec_from_hf(cfg)
    if model_type not in ("llama", "qwen2", "qwen3", "qwen3_moe"):
        raise ValueError(
            f"unsupported model_type {model_type!r} "
            f"(supported: llama, qwen2, qwen3, qwen3_moe, qwen3_next)"
        )
    hidden = get("hidden_size")
    n_heads = get("num_attention_heads")
    head_dim = get("head_dim") or hidden // n_heads
    rope_scaling = get("rope_scaling")
    if rope_scaling is not None and not isinstance(rope_scaling, dict):
        rope_scaling = dict(rope_scaling)
    return ModelSpec(
        model_type=model_type,
        num_layers=get("num_hidden_layers"),
        hidden_size=hidden,
        num_q_heads=n_heads,
        num_kv_heads=get("num_key_value_heads") or n_heads,
        head_dim=head_dim,
        intermediate_size=get("intermediate_size"),
        vocab_size=get("vocab_size"),
        rms_norm_eps=get("rms_norm_eps", 1e-6),
        rope_theta=get("rope_theta", 10000.0),
        max_position_embeddings=get("max_position_embeddings", 131072),
        rope_scaling=rope_scaling,
        tie_word_embeddings=bool(get("tie_word_embeddings", False)),
        qk_norm=model_type in ("qwen3", "qwen3_moe"),
        attn_bias=model_type == "qwen2",
        num_experts=get("num_experts", 0) or 0,
        num_experts_per_tok=get("num_experts_per_tok", 0) or 0,
        moe_intermediate_size=get("moe_intermediate_size", 0) or 0,
        norm_topk_prob=bool(get("norm_topk_prob", True)),
    )
