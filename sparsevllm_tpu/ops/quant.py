"""KV-cache quantization (KIVI-style, reference triton_kernel/quant.py).

Pass structure mirrors the reference's grouped INT quantization with
round-half-even (quant.py:19-27 — rounding choice is accuracy-visible):

  * int8: symmetric per-(token, kv-head) scales. K and V each carry one
    fp32 scale per stored token per head; dequant fuses into the attention
    kernels (ops/paged_decode.py, ops/prefill_attention.py int8 variants).
  * int4 (stage 2, deltakv latents): grouped pack/unpack, 2 values/byte.

Scales layout: kv_scales[2(k,v), L, pages, P, Nkv] fp32 — token-major like
the payload (ops/attention_ref.py docstring), addressed with the same page
table; K and V keep separate leading planes so the attention kernels get a
FREE contiguous [pages, 1, P*Nkv] flat view per plane (a combined
[..., 2, Nkv] layout would make that view strided and force a copy before
every pallas_call).
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
    k_cache: jax.Array,  # [L, pages, P, Nkv, Dh] int8
    v_cache: jax.Array,
    kv_scales: jax.Array,  # [2, L, pages, P, Nkv] f32
    layer_idx,
    k_new: jax.Array,  # [..., Nkv, Dh]
    v_new: jax.Array,
    dest_slot: jax.Array,  # [...] int32 global slot; <0 drops
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Quantize + scatter new K/V token rows into layer ``layer_idx``.

    Payload rows are [Nkv*Dh] int8 (1 KiB at 8x128) — wide enough for XLA's
    in-place scatter. Scale rows are [Nkv] f32 (narrow; XLA may copy the
    scales plane), but the scales array is ~1/128 the payload so a copy per
    prefill-chunk layer is noise."""
    l, pages, p, nkv, dh = k_cache.shape
    kq, ks = quantize_rows(k_new.reshape(-1, nkv, dh))  # [T,Nkv,Dh],[T,Nkv]
    vq, vs = quantize_rows(v_new.reshape(-1, nkv, dh))
    dest = dest_slot.reshape(-1)
    # multi-dim scatter with [Nkv, Dh] slices — no cache reshape (merging
    # minor dims is not layout-compatible with TPU tiling; see
    # ops/attention.py store_kv_layer).
    lix = jnp.broadcast_to(jnp.asarray(layer_idx, dest.dtype), dest.shape)
    page = jnp.where(dest >= 0, dest // p, -1)
    off = dest % p
    k_out = k_cache.at[lix, page, off].set(kq, mode="drop")
    v_out = v_cache.at[lix, page, off].set(vq, mode="drop")
    kv_scales = kv_scales.at[0, lix, page, off].set(ks, mode="drop")
    kv_scales = kv_scales.at[1, lix, page, off].set(vs, mode="drop")
    return k_out, v_out, kv_scales


def store_kv_quant_payload(
    k_cache: jax.Array,  # [L, pages, P, Nkv, Dh] int8
    v_cache: jax.Array,
    layer_idx,
    kq: jax.Array,  # [B, Nkv, Dh] int8 (already quantized)
    vq: jax.Array,
    dest_slot: jax.Array,  # [B] int32; <0 drops
) -> tuple[jax.Array, jax.Array]:
    """Decode-path int8 PAYLOAD store (token-major rows scatter in place).

    Scales are deliberately NOT written here: any per-layer write to the
    scales array that a pallas_call then reads in the same scan forces XLA
    to copy the whole scales array per layer (~57-100 ms/step at 3B,
    measured). The decode path batches all layers' scale writes into one
    scatter after the layer scan and merges the current token's attention
    contribution analytically (models/transformer.py,
    ops/attention.merge_token_attention)."""
    p = k_cache.shape[2]
    dest = dest_slot.reshape(-1)
    lix = jnp.broadcast_to(jnp.asarray(layer_idx, dest.dtype), dest.shape)
    page = jnp.where(dest >= 0, dest // p, -1)
    off = dest % p
    k_out = k_cache.at[lix, page, off].set(kq, mode="drop")
    v_out = v_cache.at[lix, page, off].set(vq, mode="drop")
    return k_out, v_out


def scatter_scales_batch(
    kv_scales: jax.Array,  # [2, L, pages, P, Nkv] f32
    ks_all: jax.Array,  # [L, B, Nkv] per-layer K scales of this step
    vs_all: jax.Array,  # [L, B, Nkv]
    dest_slots: jax.Array,  # [L, B] int32; <0 drops
) -> jax.Array:
    """One batched scale write for a whole decode step (all layers)."""
    l, b, nkv = ks_all.shape
    p = kv_scales.shape[3]
    lix = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32)[:, None], (l, b))
    page = jnp.where(dest_slots >= 0, dest_slots // p, -1)
    off = dest_slots % p
    kv_scales = kv_scales.at[0, lix, page, off].set(ks_all, mode="drop")
    kv_scales = kv_scales.at[1, lix, page, off].set(vs_all, mode="drop")
    return kv_scales


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
