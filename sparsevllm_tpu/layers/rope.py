"""Rotary position embeddings (functional).

Re-expresses reference layers/rotary_embedding.py:7-106: cached cos/sin tables,
``apply_rope`` and its inverse ``reverse_rope`` (De-RoPE, used by DeltaKV to
store pre-RoPE keys and re-rotate reconstructed ones), and rope-scaling
(llama3-style) support.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _llama3_scale_freqs(
    inv_freq: np.ndarray, scaling: dict
) -> np.ndarray:
    """Llama-3.1 rope scaling (HF 'llama3' rope_scaling)."""
    factor = scaling["factor"]
    low_factor = scaling.get("low_freq_factor", 1.0)
    high_factor = scaling.get("high_freq_factor", 4.0)
    orig_ctx = scaling.get("original_max_position_embeddings", 8192)
    low_wavelen = orig_ctx / low_factor
    high_wavelen = orig_ctx / high_factor
    wavelen = 2 * math.pi / inv_freq
    # three bands: scale fully, keep, or smooth-interpolate.
    scaled = inv_freq / factor
    smooth = (orig_ctx / wavelen - low_factor) / (high_factor - low_factor)
    smoothed = (1 - smooth) * scaled + smooth * inv_freq
    out = np.where(wavelen > low_wavelen, scaled, inv_freq)
    mid = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
    out = np.where(mid, smoothed, out)
    return out


def rope_table(
    head_dim: int,
    max_positions: int,
    theta: float = 10000.0,
    scaling: dict | None = None,
    dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Precompute (cos, sin) tables of shape [max_positions, head_dim//2]."""
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (np.arange(0, half, dtype=np.float64) / half))
    if scaling:
        rtype = scaling.get("rope_type", scaling.get("type", ""))
        if rtype == "llama3":
            inv_freq = _llama3_scale_freqs(inv_freq, scaling)
        elif rtype in ("linear",):
            inv_freq = inv_freq / scaling["factor"]
        elif rtype in ("default", "", None):
            pass
        else:
            raise ValueError(f"unsupported rope_scaling type {rtype!r}")
    pos = np.arange(max_positions, dtype=np.float64)
    freqs = np.outer(pos, inv_freq)  # [T, half]
    return jnp.asarray(np.cos(freqs), dtype), jnp.asarray(np.sin(freqs), dtype)


def apply_rope(
    x: jax.Array,  # [..., num_heads, head_dim]
    positions: jax.Array,  # [...] matching leading dims of x
    cos_table: jax.Array,
    sin_table: jax.Array,
    *,
    reverse: bool = False,
) -> jax.Array:
    """Rotate half-split (NeoX-style, HF Llama/Qwen convention).

    ``reverse=True`` applies the inverse rotation (De-RoPE,
    reference rotary_embedding.py reverse_rotary_emb:20-33).
    """
    cos = cos_table[positions][..., None, :]  # [..., 1, half]
    sin = sin_table[positions][..., None, :]
    if reverse:
        sin = -sin
    half = x.shape[-1] // 2
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)
