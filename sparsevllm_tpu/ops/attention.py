"""Attention op dispatch: pure-XLA reference path vs Pallas TPU kernels.

All ops operate on the **full layer-stacked cache** ``[L, pages, Nkv, P, Dh]``
with a traced ``layer_idx`` so they compose with the layer scan without
materializing per-layer slices (the Pallas kernels index pages of layer
``layer_idx`` directly in HBM).

impl='ref'    — attention_ref.py semantics (gather-based, runs anywhere).
impl='pallas' — hand-written TPU kernels (ops/paged_decode.py,
                ops/prefill_attention.py), verified against 'ref'.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import attention_ref as ref


def store_kv_layer(
    k_cache: jax.Array,  # [L, pages, Nkv, P, Dh]
    v_cache: jax.Array,
    layer_idx: jax.Array,  # scalar int32 (traced)
    k_new: jax.Array,  # [..., Nkv, Dh] with leading dims flattening to T
    v_new: jax.Array,
    dest_slot: jax.Array,  # [...] int32 global slot = page*P + off; <0 drops
) -> tuple[jax.Array, jax.Array]:
    """Scatter new K/V rows into layer ``layer_idx`` of the stacked cache."""
    l, pages, nkv, p, dh = k_cache.shape
    kf = k_new.reshape(-1, nkv, dh)
    vf = v_new.reshape(-1, nkv, dh)
    dest = dest_slot.reshape(-1)
    page = dest // p
    off = dest % p
    head = jnp.arange(nkv, dtype=dest.dtype)
    flat = (
        ((layer_idx * pages + page)[:, None] * nkv + head[None, :]) * p
        + off[:, None]
    )  # [T, Nkv]
    flat = jnp.where(dest[:, None] >= 0, flat, -1)
    k_out = (
        k_cache.reshape(-1, dh)
        .at[flat.reshape(-1)]
        .set(kf.astype(k_cache.dtype).reshape(-1, dh), mode="drop")
        .reshape(k_cache.shape)
    )
    v_out = (
        v_cache.reshape(-1, dh)
        .at[flat.reshape(-1)]
        .set(vf.astype(v_cache.dtype).reshape(-1, dh), mode="drop")
        .reshape(v_cache.shape)
    )
    return k_out, v_out


def _layer_slice(cache: jax.Array, layer_idx) -> jax.Array:
    return jax.lax.dynamic_index_in_dim(cache, layer_idx, 0, keepdims=False)


def prefill_attention(
    q: jax.Array,  # [B, S, Nq, Dh]
    k_cache: jax.Array,  # [L, pages, Nkv, P, Dh]
    v_cache: jax.Array,
    layer_idx,
    page_table: jax.Array,  # [B, MP]
    ctx_lens: jax.Array,  # [B]
    new_lens: jax.Array,  # [B]
    *,
    sm_scale: float,
    obs_window: int = 0,
    score_pooling: int = 0,
    kv_scales=None,  # [2, L, pages, Nkv, P] f32 (int8 cache) or None
    impl: str = "ref",
):
    if impl == "pallas":
        from . import prefill_attention as pk

        return pk.prefill_attention_pallas(
            q, k_cache, v_cache, layer_idx, page_table, ctx_lens, new_lens,
            sm_scale=sm_scale, obs_window=obs_window,
            score_pooling=score_pooling, kv_scales=kv_scales,
        )
    lsc = None if kv_scales is None else kv_scales[:, layer_idx]
    return ref.prefill_attention_ref(
        q,
        _layer_slice(k_cache, layer_idx),
        _layer_slice(v_cache, layer_idx),
        page_table, ctx_lens, new_lens,
        sm_scale=sm_scale, obs_window=obs_window, score_pooling=score_pooling,
        kv_scales=lsc,
    )


def decode_attention(
    q: jax.Array,  # [B, Nq, Dh]
    k_cache: jax.Array,  # [L, pages, Nkv, P, Dh]
    v_cache: jax.Array,
    layer_idx,
    page_table: jax.Array,  # [B, MP]
    ctx_lens: jax.Array,  # [B]
    *,
    sm_scale: float,
    emit_scores: bool = False,
    select_mask: jax.Array | None = None,
    page_pos: jax.Array | None = None,
    kv_scales=None,  # [2, L, pages, Nkv, P] f32 (int8 cache) or None
    impl: str = "ref",
):
    if impl == "pallas":
        from . import paged_decode as pk

        return pk.decode_attention_pallas(
            q, k_cache, v_cache, layer_idx, page_table, ctx_lens,
            sm_scale=sm_scale, emit_scores=emit_scores,
            select_mask=select_mask, page_pos=page_pos, kv_scales=kv_scales,
        )
    lsc = None if kv_scales is None else kv_scales[:, layer_idx]
    return ref.decode_attention_ref(
        q,
        _layer_slice(k_cache, layer_idx),
        _layer_slice(v_cache, layer_idx),
        page_table, ctx_lens,
        sm_scale=sm_scale, emit_scores=emit_scores, select_mask=select_mask,
        page_pos=page_pos, kv_scales=lsc,
    )
