"""DeltaKV: cluster-residual KV compression (reference crown jewels).

Re-expresses the reference DeltaKV runtime (engine/cache_manager/
deltakv_base.py + deltakv_less_memory.py + triton_kernel/deltakv_kernels.py):

  * sparse layers store PRE-RoPE K (deltakv_base.py:165-174 owns its RoPE for
    De-RoPE/Re-RoPE); here post-RoPE K lives in the normal paged pool during
    prefill and is exactly De-RoPE'd at compression time (rotations invert).
  * cluster centers at fixed stride from ``deltakv_cluster_ratio``
    (deltakv_base.py:249-295): center j = the raw (K∥V) at token j*stride.
  * residual (K∥V − center) -> learned DOWN projection -> INT4-packed latent
    (utils/compressor.py + ops/quant.pack_int4_groups; reference
    compressor-down + quant.py packing).
  * decode: observation (full) layers emit token scores; top-k compressed
    indices gather latents -> dequant -> UP -> +center -> Re-RoPE -> attend
    over [sink | recent | reconstructed top-k] (reference
    deltakv_kernels.py:2568-3488 reconstruct+writeback + sparse decode).

State pytree ``dk`` (executor-owned, scan carry):
    latents   [Ls, R, Cmax, latent//2] uint8 (int4-packed)
    lat_scale [Ls, R, Cmax] f32, lat_zero [Ls, R, Cmax] f32
    centers   [Ls, R, NC, Nkv, 2*Dh] compute-dtype (pre-RoPE K ∥ V)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import attention_ref as ref
from . import quant
from ..utils import compressor as comp_ops

NEG_INF = -1e30


def derope(k: jax.Array, positions: jax.Array, cos: jax.Array,
           sin: jax.Array) -> jax.Array:
    """Exact inverse rotary embedding (reference reverse_rotary_emb,
    layers/rotary_embedding.py:7-33): rotate by -theta*pos."""
    from ..layers.rope import apply_rope

    return apply_rope(k, positions, cos, sin, reverse=True)


def init_state(num_sparse: int, rows: int, cmax: int, ncmax: int,
               nkv: int, dh: int, latent_dim: int, dtype,
               latent_bits: int = 4) -> dict:
    per_byte = 8 // latent_bits  # int4 -> 2 values/byte, int2 -> 4
    return {
        "latents": jnp.zeros(
            (num_sparse, rows, cmax, latent_dim // per_byte), jnp.uint8
        ),
        "lat_scale": jnp.ones((num_sparse, rows, cmax), jnp.float32),
        "lat_zero": jnp.zeros((num_sparse, rows, cmax), jnp.float32),
        "centers": jnp.zeros((num_sparse, rows, ncmax, nkv, 2 * dh), dtype),
    }


def compress_layer(
    dk: dict,
    sl,  # sparse-layer slot (traced)
    comp_layer: dict,  # this layer's down/up params (compressor.layer_slice)
    arch: str,
    k_raw: jax.Array,  # [B, C, Nkv, Dh] PRE-RoPE K of the compress region
    v_raw: jax.Array,  # [B, C, Nkv, Dh]
    rows: jax.Array,  # [B]
    counts: jax.Array,  # [B] valid tokens (<= C)
    *,
    stride: int,
    latent_bits: int = 4,
    dest_offset: jax.Array | None = None,  # [B] write position (tail
    #   re-compression appends at the current compressed count; must be a
    #   multiple of ``stride`` so cluster boundaries stay aligned)
) -> dict:
    """Compress one sparse layer's region into latents + centers."""
    b, c, nkv, dh = k_raw.shape
    kv = jnp.concatenate([k_raw, v_raw], axis=-1)  # [B, C, Nkv, 2Dh]
    nc = (c + stride - 1) // stride
    center_pos = jnp.arange(nc) * stride  # token index of each center
    centers = kv[:, center_pos]  # [B, NC, Nkv, 2Dh]
    tok_center = jnp.arange(c) // stride  # [C]
    residual = kv - centers[:, tok_center]  # [B, C, Nkv, 2Dh]
    residual = residual.reshape(b, c, nkv * 2 * dh).astype(jnp.float32)
    latent = comp_ops.compress_down(
        comp_layer["down"], arch, residual
    )  # [B, C, latent]
    ld = latent.shape[-1]
    if latent_bits == 2:
        packed, scale, zero = quant.pack_int2_groups(latent, group=ld)
    else:
        packed, scale, zero = quant.pack_int4_groups(latent, group=ld)
    # one group per token: squeeze the group dim
    scale = scale[..., 0]
    zero = zero[..., 0]

    valid = jnp.arange(c)[None, :] < counts[:, None]  # [B, C]
    if dest_offset is None:
        dest_offset = jnp.zeros((b,), jnp.int32)
    cmax = dk["latents"].shape[2]
    # scatter at (row, dest_offset + j); invalid lanes write past cmax
    # and drop
    cidx = dest_offset[:, None] + jnp.arange(c)[None, :]  # [B, C]
    cidx = jnp.where(valid, cidx, cmax)
    ridx = jnp.broadcast_to(rows[:, None], (b, c))
    latents = dk["latents"].at[sl, ridx, cidx].set(packed, mode="drop")
    lat_scale = dk["lat_scale"].at[sl, ridx, cidx].set(scale, mode="drop")
    lat_zero = dk["lat_zero"].at[sl, ridx, cidx].set(zero, mode="drop")
    ncmax = dk["centers"].shape[2]
    nidx = dest_offset[:, None] // stride + jnp.arange(nc)[None, :]
    center_valid = center_pos[None, :] < counts[:, None]
    nidx = jnp.where(center_valid, nidx, ncmax)
    rnidx = jnp.broadcast_to(rows[:, None], (b, nc))
    centers_arr = dk["centers"].at[sl, rnidx, nidx].set(
        centers.astype(dk["centers"].dtype), mode="drop"
    )
    return {
        "latents": latents, "lat_scale": lat_scale,
        "lat_zero": lat_zero, "centers": centers_arr,
    }


def reconstruct(
    dk: dict,
    sl,  # sparse slot (traced)
    comp_layer: dict,
    arch: str,
    rows: jax.Array,  # [B]
    topk_idx: jax.Array,  # [B, T] compressed token indices (may exceed count)
    comp_counts: jax.Array,  # [B]
    base_pos: jax.Array,  # [B] absolute position of compressed token 0
    cos: jax.Array, sin: jax.Array,
    *,
    stride: int,
    nkv: int,
    dh: int,
    latent_bits: int = 4,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Rebuild K̂ (re-RoPE'd), V̂ for the selected compressed tokens.

    Returns (k_hat [B, T, Nkv, Dh], v_hat [B, T, Nkv, Dh], valid [B, T]).
    """
    b, t = topk_idx.shape
    valid = (topk_idx >= 0) & (topk_idx < comp_counts[:, None])
    idx = jnp.clip(topk_idx, 0, dk["latents"].shape[2] - 1)
    bidx = jnp.arange(b)[:, None]
    lat_sl = jax.lax.dynamic_index_in_dim(dk["latents"], sl, 0, False)
    sc_sl = jax.lax.dynamic_index_in_dim(dk["lat_scale"], sl, 0, False)
    zr_sl = jax.lax.dynamic_index_in_dim(dk["lat_zero"], sl, 0, False)
    ce_sl = jax.lax.dynamic_index_in_dim(dk["centers"], sl, 0, False)
    packed = lat_sl[rows[:, None], idx]  # [B, T, latent//per_byte]
    scale = sc_sl[rows[:, None], idx]  # [B, T]
    zero = zr_sl[rows[:, None], idx]
    if latent_bits == 2:
        ld = packed.shape[-1] * 4
        latent = quant.unpack_int2_groups(
            packed, scale[..., None], zero[..., None], group=ld
        )  # [B, T, latent]
    else:
        ld = packed.shape[-1] * 2
        latent = quant.unpack_int4_groups(
            packed, scale[..., None], zero[..., None], group=ld
        )  # [B, T, latent]
    residual = comp_ops.reconstruct_up(
        comp_layer["up"], arch, latent
    )  # [B, T, io]
    centers = ce_sl[rows[:, None], idx // stride]  # [B, T, Nkv, 2Dh]
    kv_hat = residual.reshape(b, t, nkv, 2 * dh) + centers.astype(jnp.float32)
    k_hat, v_hat = kv_hat[..., :dh], kv_hat[..., dh:]
    # Re-RoPE K at absolute positions
    from ..layers.rope import apply_rope

    pos = base_pos[:, None] + topk_idx  # [B, T]
    k_hat = apply_rope(k_hat, jnp.maximum(pos, 0), cos, sin)
    return k_hat, v_hat, valid


def sparse_decode_attention(
    q: jax.Array,  # [B, Nq, Dh]
    raw_k: jax.Array,  # [B, Kr, Nkv, Dh] gathered resident raw (post-RoPE)
    raw_v: jax.Array,
    raw_valid: jax.Array,  # [B, Kr] bool
    k_hat: jax.Array,  # [B, T, Nkv, Dh] reconstructed (re-RoPE'd)
    v_hat: jax.Array,
    hat_valid: jax.Array,  # [B, T]
    *,
    sm_scale: float,
) -> jax.Array:
    """Attention over [resident raw ∥ reconstructed top-k] (order-free)."""
    b, nq, dh = q.shape
    keys = jnp.concatenate(
        [raw_k.astype(jnp.float32), k_hat.astype(jnp.float32)], axis=1
    )  # [B, K, Nkv, Dh]
    vals = jnp.concatenate(
        [raw_v.astype(jnp.float32), v_hat.astype(jnp.float32)], axis=1
    )
    valid = jnp.concatenate([raw_valid, hat_valid], axis=1)  # [B, K]
    nkv = keys.shape[2]
    g = nq // nkv
    qf = q.astype(jnp.float32).reshape(b, nkv, g, dh)
    s = jnp.einsum("bhgd,bkhd->bhgk", qf, keys) * sm_scale
    s = jnp.where(valid[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgk,bkhd->bhgd", p, vals)
    return out.reshape(b, nq, dh).astype(q.dtype)
