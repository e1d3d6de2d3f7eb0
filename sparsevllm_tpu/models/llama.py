"""Llama family (Llama-2/3/3.1) on the generic scan decoder.

Reference counterpart: src/sparsevllm/models/llama.py:1-289 (LlamaForCausalLM
with chunked o_proj/MLP and per-layer sparse hooks). In the TPU build the
per-layer hook choreography lives inside models/transformer.py's scan body and
activation chunking is unnecessary (XLA rematerializes; prefill chunking
bounds activations already). This module only pins the arch quirks:
no qkv bias, no q/k norm, llama3 rope scaling handled in layers/rope.py.
"""

from __future__ import annotations

ARCH = {
    "model_type": "llama",
    "qk_norm": False,
    "attn_bias": False,
}
