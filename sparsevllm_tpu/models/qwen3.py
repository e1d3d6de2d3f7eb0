"""Qwen3 family on the generic scan decoder.

Reference counterpart: src/sparsevllm/models/qwen3.py:1-344 (adds per-head
q/k RMS norm; shared decoder base reused by the MoE variant,
qwen3.py:204-313). Arch quirks: qk_norm=True, no qkv bias.
"""

from __future__ import annotations

ARCH = {
    "model_type": "qwen3",
    "qk_norm": True,
    "attn_bias": False,
}
