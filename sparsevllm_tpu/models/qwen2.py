"""Qwen2 / Qwen2.5 family on the generic scan decoder.

Reference counterpart: src/sparsevllm/models/qwen2.py:1-327. Arch quirks vs
llama: bias on q/k/v projections (attn_bias), tied embeddings on small sizes.
"""

from __future__ import annotations

ARCH = {
    "model_type": "qwen2",
    "qk_norm": False,
    "attn_bias": True,
}
