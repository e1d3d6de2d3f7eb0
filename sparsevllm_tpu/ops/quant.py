"""KV-cache quantization (KIVI-style, reference triton_kernel/quant.py).

Pass structure mirrors the reference's grouped INT quantization with
round-half-even (quant.py:19-27 — rounding choice is accuracy-visible):

  * int8 full-KV: symmetric per-(token, kv-head) scales; dequant fuses
    into the attention kernels (ops/paged_decode.py, prefill_attention.py).
  * int4 full-KV (KIVI-4): asymmetric uint4 per (token, kv head),
    split-half packed, 4 scale planes (k/v scale + k/v zero).
  * int4 grouped (deltakv latents): last-dim grouped pack/unpack.

Scales layout: kv_scales[2(k,v), L, pages, Nkv, P] fp32 — PAGE-major with
(Nkv, P) minor: one exact (8, 128) f32 tile per (plane, layer, page), so
the array's canonical layout is padding-free. The earlier token-major
[..., P, Nkv] shape put Nkv=8 on the lane axis: its tiled form padded 16x
(8.5 GiB at a 128K-token pool) and pallas consumption materialized that
padded form — the 128K prefill bucket failed to COMPILE (17 GiB HLO temps)
and relayout copies inflated prefill wall time. Kernels take per-page
[Nkv, P] blocks and transpose in-register (one (8,128) tile, Mosaic-legal,
measured free); stores write token rows strided / page rows contiguous
(both measured < 0.1 ms at the 128K pool).
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
    kv_scales: jax.Array,  # [2, L, pages, Nkv, P] f32
    layer_idx,
    k_new: jax.Array,  # [..., Nkv, Dh]
    v_new: jax.Array,
    dest_slot: jax.Array,  # [...] int32 global slot; <0 drops
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Quantize + scatter new K/V token rows into layer ``layer_idx``.

    Payload rows are [Nkv*Dh] int8 (1 KiB at 8x128) — wide enough for XLA's
    in-place scatter. Scale rows land at [.., :, off] (Nkv strided
    elements; measured in-place and < 0.1 ms at a 128K pool)."""
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
    kv_scales = kv_scales.at[0, lix, page, :, off].set(ks, mode="drop")
    kv_scales = kv_scales.at[1, lix, page, :, off].set(vs, mode="drop")
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
    kv_scales: jax.Array,  # [NP, L, pages, Nkv, P] f32 (NP=2 int8, 4 int4)
    planes,  # tuple of [L, B, Nkv] arrays, one per leading plane
    dest_slots: jax.Array,  # [L, B] int32; <0 drops
) -> jax.Array:
    """One batched scale write for a whole decode step (all layers)."""
    l, b, nkv = planes[0].shape
    p = kv_scales.shape[4]
    lix = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32)[:, None], (l, b))
    page = jnp.where(dest_slots >= 0, dest_slots // p, -1)
    off = dest_slots % p
    for i, vals in enumerate(planes):
        kv_scales = kv_scales.at[i, lix, page, :, off].set(
            vals, mode="drop")
    return kv_scales


def gather_dequant_pages(
    cache_l: jax.Array,  # [pages, P, Nkv, Dh] int8 (one layer)
    scale_l: jax.Array,  # [pages, Nkv, P] f32
    pages: jax.Array,  # [MP] int32 page ids (logical order)
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Gather + dequantize int8 pages into a LOGICAL-ORDER float scratch
    [MP, P, Nkv, Dh] (the staged-prefill attention scratch; see
    engine/executor.py run_prefill_staged)."""
    q = cache_l[pages].astype(jnp.float32)  # [MP, P, Nkv, Dh]
    s = jnp.swapaxes(scale_l[pages], 1, 2)  # [MP, P, Nkv]
    return (q * s[..., None]).astype(dtype)


def gather_dequant_pages_u4(
    cache_l: jax.Array,  # [pages, P, Nkv*Dh//2] int8 packed flat-lane
    scale_l: jax.Array,  # [pages, Nkv, P] f32
    zero_l: jax.Array,  # [pages, Nkv, P] f32
    pages: jax.Array,  # [MP] int32
    nkv: int,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """int4 flat-lane pages -> [MP, P, Nkv, Dh] float scratch.

    Unpacks the split-half layout (byte (h, j) holds channels j and
    j + Dh/2 of head h — see the INT4 section header)."""
    pk = cache_l[pages].astype(jnp.int32)  # [MP, P, FD]
    mp, p, fd = pk.shape
    dh2 = fd // nkv
    pk = pk.reshape(mp, p, nkv, dh2)
    lo = (pk & 15).astype(jnp.float32)
    hi = ((pk >> 4) & 15).astype(jnp.float32)
    q = jnp.concatenate([lo, hi], axis=-1)  # [MP, P, Nkv, Dh]
    s = jnp.swapaxes(scale_l[pages], 1, 2)[..., None]  # [MP, P, Nkv, 1]
    z = jnp.swapaxes(zero_l[pages], 1, 2)[..., None]
    return (q * s + z).astype(dtype)


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


# ---------------------------------------------------------------------------
# INT4 full-KV cache (KIVI-4; reference triton_kernel/quant.py INT4 +
# ppl_int4kv_flash_decoding). Asymmetric uint4 per (token, kv head),
# SPLIT-HALF packed: byte j of a head's row holds channels j (low nibble)
# and j + Dh/2 (high nibble) — halves concatenate along lanes in-kernel,
# which Mosaic supports where nibble INTERLEAVING (a lane reshape) is
# rejected.
#
# Cache shape is FLAT-LANE 4-D: [L, pages, P, Nkv*Dh//2] int8 — lane
# f = h*(Dh//2) + j. The 5-D [.., Nkv, Dh//2] form put Dh//2 = 64 on the
# lane axis: every tiled materialization padded 2x, and the prefill-step
# program carried two full padded cache copies as HLO temps (the 128K
# int4 bucket exceeded HBM by 3.7 GiB at compile;
# scripts/probe_prefill_mem.py isolates it: int4 temps 1.63 GiB vs int8
# 0.22 GiB at 16K). The flat form's (P, Nkv*Dh//2) trailing dims tile
# exactly; per-token rows stay contiguous (512 B at 8x128 — above the
# in-place scatter cliff, PERF_NOTES.md).
# ---------------------------------------------------------------------------


def store_kv_quant_layer_u4(
    k_cache: jax.Array,  # [L, pages, P, Nkv*Dh//2] int8 packed flat-lane
    v_cache: jax.Array,
    kv_scales: jax.Array,  # [4, L, pages, Nkv, P] f32 (ks, vs, kz, vz)
    layer_idx,
    k_new: jax.Array,  # [..., Nkv, Dh]
    v_new: jax.Array,
    dest_slot: jax.Array,  # [...] int32 global slot; <0 drops
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """int4 prefill store: quantize + scatter packed token rows + 4 scale
    planes (same in-place discipline as the int8 store)."""
    l, pages, p, fd = k_cache.shape
    dh = k_new.shape[-1]
    nkv = fd // (dh // 2)
    kq, ks, kz = quantize_rows_u4(k_new.reshape(-1, nkv, dh))
    vq, vs, vz = quantize_rows_u4(v_new.reshape(-1, nkv, dh))
    dest = dest_slot.reshape(-1)
    lix = jnp.broadcast_to(jnp.asarray(layer_idx, dest.dtype), dest.shape)
    page = jnp.where(dest >= 0, dest // p, -1)
    off = dest % p
    k_out = k_cache.at[lix, page, off].set(
        kq.reshape(-1, fd), mode="drop")
    v_out = v_cache.at[lix, page, off].set(
        vq.reshape(-1, fd), mode="drop")
    for i, vals in enumerate((ks, vs, kz, vz)):
        kv_scales = kv_scales.at[i, lix, page, :, off].set(
            vals, mode="drop")
    return k_out, v_out, kv_scales


def quantize_rows_u4(x: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """x [..., Dh] -> (packed int8 [..., Dh//2], scale [...], zero [...]).

    q = round((x - zero)/scale) in [0, 15]; round-half-even (accuracy-
    visible, reference quant.py:19-27)."""
    xf = x.astype(jnp.float32)
    lo = jnp.min(xf, axis=-1)
    hi = jnp.max(xf, axis=-1)
    scale = jnp.where(hi > lo, (hi - lo) / 15.0, 1.0)
    zero = lo
    q = jnp.rint((xf - zero[..., None]) / scale[..., None])
    q = jnp.clip(q, 0, 15).astype(jnp.int32)
    d = x.shape[-1]
    packed = q[..., : d // 2] | (q[..., d // 2:] << 4)
    return packed.astype(jnp.int8), scale, zero


def dequantize_rows_u4(packed: jax.Array, scale: jax.Array,
                       zero: jax.Array) -> jax.Array:
    """(packed int8 [..., Dh//2], scale [...], zero [...]) -> f32 [..., Dh]."""
    pi = packed.astype(jnp.int32)
    lo = (pi & 15).astype(jnp.float32)
    hi = ((pi >> 4) & 15).astype(jnp.float32)
    q = jnp.concatenate([lo, hi], axis=-1)
    return q * scale[..., None].astype(jnp.float32) + (
        zero[..., None].astype(jnp.float32)
    )


# ---------------------------------------------------------------------------
# INT2 grouped pack/unpack (reference quant.py INT2 grouped path) — the
# DeltaKV latent pool's most aggressive setting (deltakv_latent_bits=2).
# 4 values per byte, asymmetric per-group.
# ---------------------------------------------------------------------------


def pack_int2_groups(
    x: jax.Array, group: int = 32
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """x [..., D] -> (packed uint8 [..., D//4], scale [..., D//group],
    zero [..., D//group]) asymmetric per-group (KIVI INT2)."""
    *lead, d = x.shape
    g = x.reshape(*lead, d // group, group).astype(jnp.float32)
    lo = jnp.min(g, axis=-1)
    hi = jnp.max(g, axis=-1)
    scale = jnp.where(hi > lo, (hi - lo) / 3.0, 1.0)
    zero = lo
    q = jnp.rint((g - zero[..., None]) / scale[..., None])
    q = jnp.clip(q, 0, 3).astype(jnp.uint8).reshape(*lead, d)
    packed = (
        q[..., 0::4]
        | (q[..., 1::4] << 2)
        | (q[..., 2::4] << 4)
        | (q[..., 3::4] << 6)
    ).astype(jnp.uint8)
    return packed, scale, zero


def unpack_int2_groups(
    packed: jax.Array, scale: jax.Array, zero: jax.Array, group: int = 32
) -> jax.Array:
    """Inverse of pack_int2_groups -> fp32 [..., D]."""
    p0 = (packed & 0x3).astype(jnp.float32)
    p1 = ((packed >> 2) & 0x3).astype(jnp.float32)
    p2 = ((packed >> 4) & 0x3).astype(jnp.float32)
    p3 = ((packed >> 6) & 0x3).astype(jnp.float32)
    *lead, dq = packed.shape
    d = dq * 4
    q = jnp.stack([p0, p1, p2, p3], axis=-1).reshape(*lead, d)
    g = q.reshape(*lead, d // group, group)
    out = g * scale[..., None] + zero[..., None]
    return out.reshape(*lead, d)


# ---------------------------------------------------------------------------
# INT2 full-KV cache (KIVI-2; reference deltakv_less_memory.py INT2 full
# layers + quant.py per-channel K path). The KIVI finding: at 2 bits the KEY
# cache must be quantized PER CHANNEL (statistics along the token axis —
# outlier channels get their own scale) while the VALUE cache stays
# per token. Both payloads are SPLIT-QUARTER packed along lanes (Dh): byte j
# of a row holds channels j, j+Dh/4, j+2Dh/4, j+3Dh/4 in bit fields
# (0-1, 2-3, 4-5, 6-7) — quarters concatenate along lanes in-kernel, the
# same Mosaic-legal trick as the INT4 split-half (interleaving is a lane
# reshape Mosaic rejects).
#
# Quantization is PAGE-GRANULAR: K channel statistics need a full token
# group, so pages are quantized when complete (prefill stores whole pages;
# decode accumulates a raw bf16 tail page and flushes it per-channel at each
# page boundary — the tail IS the KIVI fp-residual window, merged exactly
# into the kernel's online softmax via its (m, l) stats outputs).
#
#   k/v payload  [P, Nkv, Dh//4] int8
#   K scales     [P//G, Nkv, Dh] f32 x2 (scale, zero) — G = kivi_group_size
#   V scales     [Nkv, P]        f32 x2 (scale, zero) — same planes as int4
# ---------------------------------------------------------------------------


def _pack_quarters_lanes(q: jax.Array) -> jax.Array:
    """uint2 values [..., D] -> packed int8 [..., D//4], split-quarter along
    the last axis: byte j holds channels (j, j+D/4, j+2D/4, j+3D/4)."""
    d = q.shape[-1]
    quarter = d // 4
    return (
        q[..., :quarter]
        | (q[..., quarter : 2 * quarter] << 2)
        | (q[..., 2 * quarter : 3 * quarter] << 4)
        | (q[..., 3 * quarter :] << 6)
    ).astype(jnp.int8)


def _unpack_quarters_lanes(packed: jax.Array) -> jax.Array:
    """Inverse of _pack_quarters_lanes -> float32 [..., D] (values 0..3)."""
    pi = packed.astype(jnp.int32)
    return jnp.concatenate(
        [((pi >> (2 * j)) & 3).astype(jnp.float32) for j in range(4)],
        axis=-1,
    )


def quantize_page_k_int2(
    k_page: jax.Array,  # [..., P, Nkv, Dh] float
    group: int,
    valid_len=None,  # scalar or [...] count of valid leading tokens
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-CHANNEL asymmetric uint2 over token groups of ``group``.

    Returns (payload int8 [..., P, Nkv, Dh//4], scale f32
    [..., P//group, Nkv, Dh], zero). With ``valid_len``, statistics ignore
    token rows >= valid_len (partial prefill tail pages); their quantized
    payload is garbage and MUST be masked by the consumer (the kernels mask
    pos >= ctx)."""
    *lead, p, nkv, dh = k_page.shape
    xf = k_page.astype(jnp.float32)
    g = xf.reshape(*lead, p // group, group, nkv, dh)
    if valid_len is not None:
        tok = jnp.arange(p).reshape(p // group, group)
        vl = jnp.asarray(valid_len)
        mask = tok < vl.reshape(*vl.shape, 1, 1)  # [..., P//G, G]
        mask = mask[..., None, None]
        big = jnp.float32(3.4e38)
        lo = jnp.min(jnp.where(mask, g, big), axis=-3)
        hi = jnp.max(jnp.where(mask, g, -big), axis=-3)
        none_valid = hi < lo
        lo = jnp.where(none_valid, 0.0, lo)
        hi = jnp.where(none_valid, 0.0, hi)
    else:
        lo = jnp.min(g, axis=-3)  # [..., P//G, Nkv, Dh]
        hi = jnp.max(g, axis=-3)
    scale = jnp.where(hi > lo, (hi - lo) / 3.0, 1.0)
    zero = lo
    q = jnp.rint((g - zero[..., None, :, :]) / scale[..., None, :, :])
    q = jnp.clip(q, 0, 3).astype(jnp.int32).reshape(*lead, p, nkv, dh)
    return _pack_quarters_lanes(q), scale, zero


def dequantize_page_k_int2(
    packed: jax.Array,  # [..., P, Nkv, Dh//4] int8
    scale: jax.Array,  # [..., P//G, Nkv, Dh] f32
    zero: jax.Array,
    group: int,
) -> jax.Array:
    """Inverse of quantize_page_k_int2 -> f32 [..., P, Nkv, Dh]."""
    q = _unpack_quarters_lanes(packed)  # [..., P, Nkv, Dh]
    *lead, p, nkv, dh = q.shape
    g = q.reshape(*lead, p // group, group, nkv, dh)
    out = g * scale[..., None, :, :] + zero[..., None, :, :]
    return out.reshape(*lead, p, nkv, dh)


def quantize_page_v_int2(
    v_page: jax.Array,  # [..., Nkv, Dh] float (any leading shape)
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-TOKEN asymmetric uint2 (values tolerate per-token scales; KIVI).

    Returns (payload int8 [..., Nkv, Dh//4], scale f32 [..., Nkv], zero)."""
    xf = v_page.astype(jnp.float32)
    lo = jnp.min(xf, axis=-1)
    hi = jnp.max(xf, axis=-1)
    scale = jnp.where(hi > lo, (hi - lo) / 3.0, 1.0)
    zero = lo
    q = jnp.rint((xf - zero[..., None]) / scale[..., None])
    q = jnp.clip(q, 0, 3).astype(jnp.int32)
    return _pack_quarters_lanes(q), scale, zero


def dequantize_page_v_int2(
    packed: jax.Array, scale: jax.Array, zero: jax.Array
) -> jax.Array:
    """Inverse of quantize_page_v_int2 -> f32 [..., Nkv, Dh]."""
    q = _unpack_quarters_lanes(packed)
    return q * scale[..., None] + zero[..., None]


def scatter_flush_scales_int2(
    kv_scales: jax.Array,  # [2, L, pages, Nkv, P] f32 (vs, vz)
    k_ch_scales: jax.Array,  # [2, L, pages, P//G, Nkv, Dh] f32 (ks, kz)
    ks: jax.Array,  # [L, B, P//G, Nkv, Dh]
    kz: jax.Array,
    vs: jax.Array,  # [L, B, P, Nkv] (token-major; transposed here)
    vz: jax.Array,
    dest_page: jax.Array,  # [L, B] int32; <0 drops (off-boundary steps)
):
    """One batched KIVI-2 flush-scale write for a whole decode step (all
    layers; payload pages were stored in-scan — scales must not be, see
    store_kv_quant_payload)."""
    l, bsz = dest_page.shape
    lix = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32)[:, None],
                           (l, bsz))
    vs_t = jnp.swapaxes(vs, -1, -2)  # [L, B, Nkv, P]
    vz_t = jnp.swapaxes(vz, -1, -2)
    kv_scales = kv_scales.at[0, lix, dest_page].set(vs_t, mode="drop")
    kv_scales = kv_scales.at[1, lix, dest_page].set(vz_t, mode="drop")
    k_ch_scales = k_ch_scales.at[0, lix, dest_page].set(ks, mode="drop")
    k_ch_scales = k_ch_scales.at[1, lix, dest_page].set(kz, mode="drop")
    return kv_scales, k_ch_scales


def store_pages_int2(
    k_cache: jax.Array,  # [L, pages, P, Nkv, Dh//4] int8
    v_cache: jax.Array,
    kv_scales: jax.Array,  # [2, L, pages, Nkv, P] f32 (vs, vz)
    k_ch_scales: jax.Array,  # [2, L, pages, P//G, Nkv, Dh] f32 (ks, kz)
    layer_idx,
    k_new: jax.Array,  # [NPg, P, Nkv, Dh] whole (possibly partial) pages
    v_new: jax.Array,
    dest_page: jax.Array,  # [NPg] int32 physical page; <0 drops
    valid_len: jax.Array,  # [NPg] valid tokens per page (partial tails)
    group: int,
):
    """Quantize + scatter WHOLE pages (prefill chunks are page-aligned;
    the final partial page quantizes over masked stats and is additionally
    kept raw in the tail buffer for decode)."""
    kq, ks, kz = quantize_page_k_int2(k_new, group, valid_len)
    vq, vs, vz = quantize_page_v_int2(v_new)  # vs/vz [NPg, P, Nkv]
    lix = jnp.broadcast_to(jnp.asarray(layer_idx, dest_page.dtype),
                           dest_page.shape)
    pg = dest_page
    k_cache = k_cache.at[lix, pg].set(kq, mode="drop")
    v_cache = v_cache.at[lix, pg].set(vq, mode="drop")
    kv_scales = kv_scales.at[0, lix, pg].set(
        jnp.swapaxes(vs, -1, -2), mode="drop")
    kv_scales = kv_scales.at[1, lix, pg].set(
        jnp.swapaxes(vz, -1, -2), mode="drop")
    k_ch_scales = k_ch_scales.at[0, lix, pg].set(ks, mode="drop")
    k_ch_scales = k_ch_scales.at[1, lix, pg].set(kz, mode="drop")
    return k_cache, v_cache, kv_scales, k_ch_scales
