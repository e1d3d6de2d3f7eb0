"""Attention op dispatch: pure-XLA reference path vs Pallas TPU kernels.

All ops operate on the **full layer-stacked cache** ``[L, pages, P, Nkv, Dh]``
(token-major within a page — see ops/attention_ref.py docstring for why) with
a traced ``layer_idx`` so they compose with the layer scan without
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
    k_cache: jax.Array,  # [L, pages, P, Nkv, Dh]
    v_cache: jax.Array,
    layer_idx: jax.Array,  # scalar int32 (traced)
    k_new: jax.Array,  # [..., Nkv, Dh] with leading dims flattening to T
    v_new: jax.Array,
    dest_slot: jax.Array,  # [...] int32 global slot = page*P + off; <0 drops
) -> tuple[jax.Array, jax.Array]:
    """Scatter new K/V token rows into layer ``layer_idx``.

    Token-major rows ([Nkv*Dh] contiguous per stored token — 2 KiB bf16 /
    1 KiB int8 at 8x128) keep XLA's scatter on the in-place path; narrower
    rows silently degrade to a full-cache copy per store (measured cliff in
    PERF_NOTES.md)."""
    l, pages, p, nkv, dh = k_cache.shape
    kf = k_new.reshape(-1, nkv, dh)
    vf = v_new.reshape(-1, nkv, dh)
    dest = dest_slot.reshape(-1)
    # multi-dim scatter (layer, page, off) with [Nkv, Dh] update slices —
    # one physical (8,128) tile per token; NO cache reshape (merging minor
    # dims is not layout-compatible with TPU tiling -> full-cache copy).
    lix = jnp.broadcast_to(
        jnp.asarray(layer_idx, dest.dtype), dest.shape
    )
    page = jnp.where(dest >= 0, dest // p, -1)
    off = dest % p
    k_out = k_cache.at[lix, page, off].set(
        kf.astype(k_cache.dtype), mode="drop"
    )
    v_out = v_cache.at[lix, page, off].set(
        vf.astype(v_cache.dtype), mode="drop"
    )
    return k_out, v_out


def _layer_slice(cache: jax.Array, layer_idx) -> jax.Array:
    return jax.lax.dynamic_index_in_dim(cache, layer_idx, 0, keepdims=False)


def prefill_attention(
    q: jax.Array,  # [B, S, Nq, Dh]
    k_cache: jax.Array,  # [L, pages, P, Nkv, Dh]
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
    k_ch_scales=None,  # [2, L, pages, P//G, Nkv, Dh] f32 (KIVI-2) or None
    impl: str = "ref",
):
    if impl == "pallas":
        from . import prefill_attention as pk

        return pk.prefill_attention_pallas(
            q, k_cache, v_cache, layer_idx, page_table, ctx_lens, new_lens,
            sm_scale=sm_scale, obs_window=obs_window,
            score_pooling=score_pooling, kv_scales=kv_scales,
            k_ch_scales=k_ch_scales,
        )
    lsc = None if kv_scales is None else kv_scales[:, layer_idx]
    lkc = None if k_ch_scales is None else k_ch_scales[:, layer_idx]
    return ref.prefill_attention_ref(
        q,
        _layer_slice(k_cache, layer_idx),
        _layer_slice(v_cache, layer_idx),
        page_table, ctx_lens, new_lens,
        sm_scale=sm_scale, obs_window=obs_window, score_pooling=score_pooling,
        kv_scales=lsc, k_ch_scales=lkc,
    )


def decode_attention(
    q: jax.Array,  # [B, Nq, Dh]
    k_cache: jax.Array,  # [L, pages, P, Nkv, Dh]
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
    k_ch_scales=None,  # [2, L, pages, P//G, Nkv, Dh] f32 (KIVI-2) or None
    impl: str = "ref",
    return_stats: bool = False,
):
    if impl == "pallas":
        from . import paged_decode as pk

        return pk.decode_attention_pallas(
            q, k_cache, v_cache, layer_idx, page_table, ctx_lens,
            sm_scale=sm_scale, emit_scores=emit_scores,
            select_mask=select_mask, page_pos=page_pos, kv_scales=kv_scales,
            k_ch_scales=k_ch_scales, return_stats=return_stats,
        )
    lsc = None if kv_scales is None else kv_scales[:, layer_idx]
    lkc = None if k_ch_scales is None else k_ch_scales[:, layer_idx]
    return ref.decode_attention_ref(
        q,
        _layer_slice(k_cache, layer_idx),
        _layer_slice(v_cache, layer_idx),
        page_table, ctx_lens,
        sm_scale=sm_scale, emit_scores=emit_scores, select_mask=select_mask,
        page_pos=page_pos, kv_scales=lsc, k_ch_scales=lkc,
        return_stats=return_stats,
    )


def merge_token_attention(
    out_h, m_h, l_h,  # history attention (stats form) [B,Nq,Dh],[B,Nq],[B,Nq]
    q,  # [B, Nq, Dh]
    k_extra,  # [B, Nkv, Dh] fp values of the extra key (e.g. current token)
    v_extra,  # [B, Nkv, Dh]
    *,
    sm_scale: float,
):
    """Exactly merge one extra key/value into a stats-form attention result.

    softmax decomposition: with history (m, l, out) and one extra score s_c,
        m_f = max(m, s_c); a = exp(m - m_f); e = exp(s_c - m_f)
        out_f = (a*l*out + e*v) / (a*l + e)
    Used by the int8 decode path to defer the current token (its scale is
    batch-written after the layer scan; see models/transformer.py)."""
    b, nq, dh = q.shape
    nkv = k_extra.shape[1]
    g = nq // nkv
    kf = jnp.repeat(k_extra.astype(jnp.float32), g, axis=1)  # [B, Nq, Dh]
    vf = jnp.repeat(v_extra.astype(jnp.float32), g, axis=1)
    s_c = jnp.einsum("bhd,bhd->bh", q.astype(jnp.float32), kf) * sm_scale
    m_f = jnp.maximum(m_h, s_c)
    a = jnp.exp(m_h - m_f)
    e = jnp.exp(s_c - m_f)
    num = (a * l_h)[..., None] * out_h.astype(jnp.float32) + e[..., None] * vf
    den = a * l_h + e
    return (num / den[..., None]).astype(out_h.dtype)


def merge_tail_attention(
    out_h, m_h, l_h,  # history attention (stats form) [B,Nq,Dh],[B,Nq],[B,Nq]
    q,  # [B, Nq, Dh]
    k_tail,  # [B, T, Nkv, Dh] raw tail keys (post-RoPE, tail slot order)
    v_tail,  # [B, T, Nkv, Dh]
    tail_len,  # [B] int32: tail slots < tail_len are valid
    *,
    sm_scale: float,
):
    """Exactly merge a raw KV tail into a stats-form attention result.

    Generalizes merge_token_attention from one extra key to T of them —
    the KIVI-2 decode path runs the kernel over the QUANTIZED full pages
    only (ctx rounded down to a page boundary) and merges the raw bf16
    tail page (the KIVI fp-residual window) plus the current token exactly:
        m_f = max(m_h, max_j s_j); a = exp(m_h - m_f); p_j = exp(s_j - m_f)
        out_f = (a*l_h*out_h + sum_j p_j v_j) / (a*l_h + sum_j p_j)
    """
    b, nq, dh = q.shape
    t, nkv = k_tail.shape[1], k_tail.shape[2]
    g = nq // nkv
    qf = q.astype(jnp.float32).reshape(b, nkv, g, dh)
    kf = k_tail.astype(jnp.float32)
    vf = v_tail.astype(jnp.float32)
    s = jnp.einsum("bkgd,btkd->bkgt", qf, kf) * sm_scale  # [B, Nkv, G, T]
    valid = (jnp.arange(t)[None, :] < tail_len[:, None])[:, None, None, :]
    s = jnp.where(valid, s, -1e30)
    s = s.reshape(b, nq, t)
    m_t = jnp.max(s, axis=-1)  # [B, Nq]
    m_f = jnp.maximum(m_h, m_t)
    a = jnp.exp(m_h - m_f)
    p = jnp.exp(s - m_f[..., None]) * valid.reshape(b, 1, t)
    pv = jnp.einsum(
        "bkgt,btkd->bkgd", p.reshape(b, nkv, g, t), vf
    ).reshape(b, nq, dh)
    num = (a * l_h)[..., None] * out_h.astype(jnp.float32) + pv
    den = a * l_h + jnp.sum(p, axis=-1)
    den = jnp.where(den <= 0.0, 1.0, den)
    return (num / den[..., None]).astype(out_h.dtype)


def merge_attention_stats(o1, m1, l1, o2, m2, l2):
    """Exactly merge two stats-form attention results over DISJOINT key
    sets (softmax decomposition; both inputs are (normalized out, running
    max, sumexp)). Returns the merged (out, m, l) in stats form so further
    merges (e.g. the deferred current token) stay exact."""
    import jax.numpy as jnp

    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m) * l1
    a2 = jnp.exp(m2 - m) * l2
    l = a1 + a2
    l_safe = jnp.where(l <= 0.0, 1.0, l)
    out = (
        o1.astype(jnp.float32) * (a1 / l_safe)[..., None]
        + o2.astype(jnp.float32) * (a2 / l_safe)[..., None]
    )
    return out.astype(o1.dtype), m, l
