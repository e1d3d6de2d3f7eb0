"""KV-cache quantization (KIVI-style, reference triton_kernel/quant.py).

Pass structure mirrors the reference's grouped INT quantization with
round-half-even (quant.py:19-27 — rounding choice is accuracy-visible):

  * int8: symmetric per-(token, kv-head) scales. K and V each carry one
    fp32 scale per stored token per head; dequant fuses into the attention
    kernels (ops/paged_decode.py, ops/prefill_attention.py int8 variants).
  * int4 (stage 2, deltakv latents): grouped pack/unpack, 2 values/byte.

Scales layout: kv_scales[2(k,v), L, pages, Nkv, P] fp32 — one row per cache
slot, addressed with the same page table as the payload.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INT8_MAX = 127.0


def quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """x [..., Dh] -> (int8 [..., Dh], scale [...]) symmetric round-half-even."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.where(absmax > 0, absmax / INT8_MAX, 1.0)
    q = jnp.rint(x.astype(jnp.float32) / scale[..., None])
    q = jnp.clip(q, -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, scale


def dequantize_rows(q: jax.Array, scale: jax.Array) -> jax.Array:
    """(int8 [..., Dh], scale [...]) -> fp32 [..., Dh]."""
    return q.astype(jnp.float32) * scale[..., None].astype(jnp.float32)


def store_kv_quant_layer(
    k_cache: jax.Array,  # [L, pages, Nkv, P, Dh] int8
    v_cache: jax.Array,
    kv_scales: jax.Array,  # [2, L, pages, Nkv, P] f32
    layer_idx,
    k_new: jax.Array,  # [..., Nkv, Dh]
    v_new: jax.Array,
    dest_slot: jax.Array,  # [...] int32 global slot; <0 drops
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Quantize + scatter new K/V rows into layer ``layer_idx``."""
    l, pages, nkv, p, dh = k_cache.shape
    kq, ks = quantize_rows(k_new.reshape(-1, nkv, dh))  # [T,Nkv,Dh],[T,Nkv]
    vq, vs = quantize_rows(v_new.reshape(-1, nkv, dh))
    dest = dest_slot.reshape(-1)
    page = dest // p
    off = dest % p
    head = jnp.arange(nkv, dtype=dest.dtype)
    flat = (
        ((layer_idx * pages + page)[:, None] * nkv + head[None, :]) * p
        + off[:, None]
    )  # [T, Nkv]
    flat = jnp.where(dest[:, None] >= 0, flat, -1).reshape(-1)
    k_out = (
        k_cache.reshape(-1, dh).at[flat].set(kq.reshape(-1, dh), mode="drop")
        .reshape(k_cache.shape)
    )
    v_out = (
        v_cache.reshape(-1, dh).at[flat].set(vq.reshape(-1, dh), mode="drop")
        .reshape(v_cache.shape)
    )
    sflat = kv_scales.reshape(2, -1)
    sflat = sflat.at[0, flat].set(ks.reshape(-1), mode="drop")
    sflat = sflat.at[1, flat].set(vs.reshape(-1), mode="drop")
    return k_out, v_out, sflat.reshape(kv_scales.shape)


def store_kv_quant_decode(
    k_cache: jax.Array,  # [L, pages, Nkv, P, Dh] int8
    v_cache: jax.Array,
    kv_scales: jax.Array,  # [2, L, pages, Nkv, P] f32
    layer_idx,
    k_new: jax.Array,  # [B, Nkv, Dh]
    v_new: jax.Array,
    dest_slot: jax.Array,  # [B] int32; <0 writes into trash page 0 slot 0
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Decode-path store: dynamic_update_slice per token.

    XLA's TPU scatter on int8 operands materializes a full cache copy even
    when donated (~3 ms/layer at 3B scale); a fori_loop of
    dynamic_update_slices stays in place (~75 us/layer for the whole batch).
    The batch is small (<= max_decoding_seqs), so the sequential loop is
    noise next to attention.
    """
    p = k_cache.shape[3]
    kq, ks = quantize_rows(k_new)  # [B, Nkv, Dh], [B, Nkv]
    vq, vs = quantize_rows(v_new)

    def tok(t, carry):
        kc, vc, sc = carry
        d = jnp.maximum(dest_slot[t], 0)  # <0 -> trash page 0, slot 0
        page, off = d // p, d % p
        kc = jax.lax.dynamic_update_slice(
            kc, kq[t][None, None, :, None, :], (layer_idx, page, 0, off, 0)
        )
        vc = jax.lax.dynamic_update_slice(
            vc, vq[t][None, None, :, None, :], (layer_idx, page, 0, off, 0)
        )
        sc = jax.lax.dynamic_update_slice(
            sc, jnp.stack([ks[t], vs[t]])[:, None, None, :, None],
            (0, layer_idx, page, 0, off),
        )
        return kc, vc, sc

    return jax.lax.fori_loop(
        0, k_new.shape[0], tok, (k_cache, v_cache, kv_scales)
    )


# ---------------------------------------------------------------------------
# INT4 grouped pack/unpack (reference quant.py:29-218 last-dim grouping) —
# used by the DeltaKV latent pool.
# ---------------------------------------------------------------------------


def pack_int4_groups(
    x: jax.Array, group: int = 32
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """x [..., D] -> (packed uint8 [..., D//2], scale [..., D//group],
    zero [..., D//group]) asymmetric per-group (KIVI INT4)."""
    *lead, d = x.shape
    g = x.reshape(*lead, d // group, group).astype(jnp.float32)
    lo = jnp.min(g, axis=-1)
    hi = jnp.max(g, axis=-1)
    scale = jnp.where(hi > lo, (hi - lo) / 15.0, 1.0)
    zero = lo
    q = jnp.rint((g - zero[..., None]) / scale[..., None])
    q = jnp.clip(q, 0, 15).astype(jnp.uint8).reshape(*lead, d)
    packed = (q[..., 0::2] | (q[..., 1::2] << 4)).astype(jnp.uint8)
    return packed, scale, zero


def unpack_int4_groups(
    packed: jax.Array, scale: jax.Array, zero: jax.Array, group: int = 32
) -> jax.Array:
    """Inverse of pack_int4_groups -> fp32 [..., D]."""
    lo = (packed & 0xF).astype(jnp.float32)
    hi = (packed >> 4).astype(jnp.float32)
    *lead, dh = packed.shape
    d = dh * 2
    q = jnp.stack([lo, hi], axis=-1).reshape(*lead, d)
    g = q.reshape(*lead, d // group, group)
    out = g * scale[..., None] + zero[..., None]
    return out.reshape(*lead, d)
