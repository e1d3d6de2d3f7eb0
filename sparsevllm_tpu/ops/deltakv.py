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

State pytree ``dk`` (executor-owned, read-only in decode):
    latents   [Ls, R, Cmax, REC/4] f32-typed RECORD rows — packed latent ∥
              f32 group scales/zeros ∥ int32 fathers (_record_geometry)
    centers   [Ls, R, NC, Nkv*2*Dh] compute-dtype (pre-RoPE K ∥ V, flat)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import attention_ref as ref
from . import quant
from ..utils import compressor as comp_ops

NEG_INF = -1e30


def derope(k: jax.Array, positions: jax.Array, cos: jax.Array,
           sin: jax.Array, rot_dim: int = 0) -> jax.Array:
    """Exact inverse rotary embedding (reference reverse_rotary_emb,
    layers/rotary_embedding.py:7-33): rotate by -theta*pos.

    ``rot_dim`` > 0 inverts only the first rot_dim channels (hybrid
    qwen3_next partial RoPE, models/qwen3_next.partial_rope)."""
    from ..layers.rope import apply_rope

    if rot_dim and rot_dim < k.shape[-1]:
        rot = apply_rope(k[..., :rot_dim], positions, cos, sin,
                         reverse=True)
        return jnp.concatenate([rot, k[..., rot_dim:]], axis=-1)
    return apply_rope(k, positions, cos, sin, reverse=True)


def rerope(k: jax.Array, positions: jax.Array, cos: jax.Array,
           sin: jax.Array, rot_dim: int = 0) -> jax.Array:
    """Forward rotary at absolute positions (full or partial width)."""
    from ..layers.rope import apply_rope

    if rot_dim and rot_dim < k.shape[-1]:
        rot = apply_rope(k[..., :rot_dim], positions, cos, sin)
        return jnp.concatenate([rot, k[..., rot_dim:]], axis=-1)
    return apply_rope(k, positions, cos, sin)


def _record_geometry(latent_dim: int, latent_bits: int, latent_group: int,
                     neighbors: int):
    """Byte offsets of the per-token RECORD row.

    ALL per-token compressed state (packed latent, f32 scale/zero per
    group, int32 fathers) lives in ONE uint8 row of the latents array,
    padded to a 128-lane multiple. Separate [.., Cmax, G<=8] /
    [.., G, Cmax] planes were a tile-padding/relayout bomb: XLA chose
    transposed G-minor layouts (16-32x padding) and kept 1.6 GiB remat
    copies of each plane inside the decode megastep — the 128K deltakv
    bench OOM (PERF_NOTES rule 4). A single record row gathers exactly
    like the payload (sublane-axis gather, 128-multiple lanes): one
    gather, no relayouts."""
    per_byte = 8 // latent_bits
    g = latent_group or latent_dim
    ngrp = latent_dim // g
    lat_b = latent_dim // per_byte
    sc_off = lat_b
    zr_off = sc_off + 4 * ngrp  # f32 scales
    fa_off = zr_off + 4 * ngrp  # f32 zeros
    end = fa_off + 4 * neighbors  # int32 fathers
    # pad to 128 f32 WORDS (512 bytes): the storage array is f32-typed, so
    # its LANE axis is rec//4 — a 128-BYTE pad left 96-word lanes, a
    # sub-128 minor dim on a GiB-scale table (PERF_NOTES rule 4): XLA
    # assigned transposed layouts per consumer and materialized whole-table
    # relayout copies inside the decode megastep (2.84 GiB of HLO temps at
    # 128K — the recon-v2.1 compile OOM's #1/#2 allocations).
    rec = -(-end // 512) * 512
    return ngrp, lat_b, sc_off, zr_off, fa_off, rec


def _f32_to_u8(x):  # [..., N] f32 -> [..., 4N] u8 (little-endian lanes)
    u8 = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint8)
    return u8.reshape(*x.shape[:-1], x.shape[-1] * 4)


def _u8_to_f32(x):  # [..., 4N] u8 -> [..., N] f32
    quads = x.reshape(*x.shape[:-1], x.shape[-1] // 4, 4)
    return jax.lax.bitcast_convert_type(quads, jnp.float32)


def _i32_to_u8(x):
    u8 = jax.lax.bitcast_convert_type(x.astype(jnp.int32), jnp.uint8)
    return u8.reshape(*x.shape[:-1], x.shape[-1] * 4)


def _u8_to_i32(x):
    quads = x.reshape(*x.shape[:-1], x.shape[-1] // 4, 4)
    return jax.lax.bitcast_convert_type(quads, jnp.int32)


def init_state(num_sparse: int, rows: int, cmax: int, ncmax: int,
               nkv: int, dh: int, latent_dim: int, dtype,
               latent_bits: int = 4, latent_group: int = 0,
               neighbors: int = 4) -> dict:
    *_, rec = _record_geometry(latent_dim, latent_bits, latent_group,
                               neighbors)
    return {
        # per-token RECORD rows: packed latent ∥ f32 scales ∥ f32 zeros ∥
        # int32 nearest-causal-center fathers (reference _cluster_refs +
        # token_father_idx, cache_pipeline.py:433-481 — positional
        # j//stride refs measured 0.33 oracle recall vs 1.00 exact).
        # STORED f32-TYPED (opaque 4-byte payload words): u8 storage made
        # every reader bitcast the WHOLE table (XLA materializes the
        # (4,1)-tiled u8 -> f32 relayout, ~1 ms/layer/step in the decode
        # scan); f32 words take_along at full gather speed and only the
        # gathered rows bitcast back to bytes.
        "latents": jnp.zeros((num_sparse, rows, cmax, rec // 4),
                             jnp.float32),
        # FLAT kv dim: [.., NC, Nkv*2Dh] — lanes are an exact 128
        # multiple and the sublane dim is NC, so tiled commitment equals
        # logical bytes. The head-split [.., NC, Nkv, 2Dh] form put Nkv
        # (4-8) on the sublane axis: bf16 (16,128) tiles padded it 2-4x
        # IN COMMITTED HBM (the 7B lane's phantom residency) and the
        # decode megastep kept a whole-table relayout copy (compile-OOM
        # report item 4).
        "centers": jnp.zeros((num_sparse, rows, ncmax, nkv * 2 * dh),
                             dtype),
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
    latent_group: int = 0,
    neighbors: int = 4,
    dest_offset: jax.Array | None = None,  # [B] write position (tail
    #   re-compression appends at the current compressed count; must be a
    #   multiple of ``stride`` so cluster boundaries stay aligned)
) -> dict:
    """Compress one sparse layer's region into latents + centers.

    Reference-faithful reconstruction recipe (cache_pipeline.py:433-604):
    centers sit at fixed-stride positions, but each token's REFERENCE is
    the mean of its ``neighbors`` nearest CAUSAL centers under the l2
    metric over the full (K∥V) vector; the payload is the LATENT-space
    residual ``down(kv) - down(ref)`` (identical to ``down(kv - ref)``
    for linear/origin codecs) and reconstruction is ``up(payload) + ref``.
    Father indices persist in the state so reconstruction regathers the
    same refs."""
    b, c, nkv, dh = k_raw.shape
    kvdim = nkv * 2 * dh
    kv = jnp.concatenate([k_raw, v_raw], axis=-1)  # [B, C, Nkv, 2Dh]
    kvf = kv.reshape(b, c, kvdim).astype(jnp.float32)
    nc = (c + stride - 1) // stride
    center_pos = jnp.arange(nc) * stride  # span-token index of each center
    centers = kv[:, center_pos]  # [B, NC, Nkv, 2Dh]

    valid = jnp.arange(c)[None, :] < counts[:, None]  # [B, C]
    if dest_offset is None:
        dest_offset = jnp.zeros((b,), jnp.int32)
    cmax = dk["latents"].shape[2]
    ncmax = dk["centers"].shape[2]
    prev_n = dest_offset // stride  # [B] pre-existing centers per row

    # 1) write the NEW centers (so scoring sees old + new in one array)
    nidx = prev_n[:, None] + jnp.arange(nc)[None, :]
    center_valid = center_pos[None, :] < counts[:, None]
    nidx_w = jnp.where(center_valid, nidx, ncmax)
    rnidx = jnp.broadcast_to(rows[:, None], (b, nc))
    centers_arr = dk["centers"].at[sl, rnidx, nidx_w].set(
        centers.reshape(b, nc, kvdim).astype(dk["centers"].dtype),
        mode="drop",
    )

    # 2) nearest-causal-center fathers (l2 over K∥V; argmax 2x·c − |c|²)
    cen_all = jax.lax.dynamic_index_in_dim(
        centers_arr, sl, 0, keepdims=False
    )[rows]  # [B, NCmax, KV]
    cf = cen_all.astype(jnp.float32)
    dot = jnp.einsum("bck,bnk->bcn", kvf, cf,
                     preferred_element_type=jnp.float32)
    cn2 = jnp.sum(cf * cf, axis=-1)  # [B, NCmax]
    scores = 2.0 * dot - cn2[:, None, :]  # [B, C, NCmax]
    tok = jnp.arange(c, dtype=jnp.int32)[None, :, None]
    slot = jnp.arange(ncmax, dtype=jnp.int32)[None, None, :]
    j = slot - prev_n[:, None, None]  # new-center index within this span
    allowed = (slot < prev_n[:, None, None]) | (
        (j >= 0) & (j * stride <= tok) & (j * stride < counts[:, None, None])
    )
    scores = jnp.where(allowed, scores, NEG_INF)
    nn = neighbors
    k_sel = min(nn, ncmax)
    vals, fathers = jax.lax.top_k(scores, k_sel)  # [B, C, NN]
    # early tokens have fewer than NN causal centers: replace disallowed
    # picks (score NEG_INF) with the best father so the mean stays clean
    fathers = jnp.where(vals > NEG_INF / 2, fathers, fathers[..., :1])
    if k_sel < nn:
        fathers = jnp.pad(fathers, ((0, 0), (0, 0), (0, nn - k_sel)),
                          mode="edge")
    refs = cf[jnp.arange(b)[:, None, None], fathers].mean(axis=2)  # [B,C,KV]

    # 3) latent-space residual
    latent = comp_ops.compress_down(
        comp_layer["down"], arch, kvf
    ) - comp_ops.compress_down(comp_layer["down"], arch, refs)
    ld = latent.shape[-1]
    g = latent_group or ld
    if latent_bits == 2:
        packed, scale, zero = quant.pack_int2_groups(latent, group=g)
    else:
        packed, scale, zero = quant.pack_int4_groups(latent, group=g)

    # 4) ONE record scatter at (row, dest_offset + j); invalid lanes drop
    # past cmax (record geometry: _record_geometry docstring; rows are
    # f32-typed payload words — see init_state)
    rec4 = dk["latents"].shape[3]
    record = jnp.concatenate([
        packed.astype(jnp.uint8),
        _f32_to_u8(scale),
        _f32_to_u8(zero),
        _i32_to_u8(fathers.astype(jnp.int32)),
    ], axis=-1)
    record = jnp.pad(
        record, ((0, 0), (0, 0), (0, 4 * rec4 - record.shape[-1]))
    )
    record_f32 = jax.lax.bitcast_convert_type(
        record.reshape(b, c, rec4, 4), jnp.float32
    )
    cidx = dest_offset[:, None] + jnp.arange(c)[None, :]  # [B, C]
    cidx = jnp.where(valid, cidx, cmax)
    ridx = jnp.broadcast_to(rows[:, None], (b, c))
    latents = dk["latents"].at[sl, ridx, cidx].set(record_f32, mode="drop")
    return {"latents": latents, "centers": centers_arr}


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
    latent_group: int = 0,
    rot_dim: int = 0,
    latent_dim: int = 0,
    neighbors: int = 4,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Rebuild K̂ (re-RoPE'd), V̂ for the selected compressed tokens.

    Returns (k_hat [B, T, Nkv, Dh], v_hat [B, T, Nkv, Dh], valid [B, T]).
    ``rot_dim`` > 0 re-RoPEs only the partial rotary width (hybrid).
    """
    b, t = topk_idx.shape
    valid = (topk_idx >= 0) & (topk_idx < comp_counts[:, None])
    idx = jnp.clip(topk_idx, 0, dk["latents"].shape[2] - 1)
    lat_sl = jax.lax.dynamic_index_in_dim(dk["latents"], sl, 0, False)
    ce_sl = jax.lax.dynamic_index_in_dim(dk["centers"], sl, 0, False)
    if not latent_dim:
        raise ValueError("reconstruct requires latent_dim (record layout)")
    ngrp, lat_b, sc_off, zr_off, fa_off, _rec = _record_geometry(
        latent_dim, latent_bits, latent_group, neighbors
    )
    # ONE record gather (f32 payload words, take_along_axis): the
    # advanced-index u8 form lowered to a 5 ms gather on TPU (x26 layers
    # x32 lane steps = 4.3 s/dispatch, the 7 tok/s first deltakv bench),
    # and a per-read whole-table u8->f32 bitcast materialized a relayout
    # copy — hence f32-typed STORAGE (init_state).
    rec4 = lat_sl.shape[-1]
    # flattened single gather: ``lat_sl[rows]`` materialized the WHOLE
    # [Cmax, REC/4] table slice per layer-step (50 MB x26 at 128K, traced
    # 5 ms/step); a flat row-take touches only the selected rows
    flat = lat_sl.reshape(-1, rec4)
    gidx = rows[:, None] * lat_sl.shape[1] + idx  # [B, T]
    got = jnp.take(flat, gidx, axis=0)  # [B, T, REC/4]
    record = jax.lax.bitcast_convert_type(
        got, jnp.uint8
    ).reshape(b, t, 4 * rec4)  # [B, T, REC]
    packed = record[..., :lat_b]
    scale = _u8_to_f32(record[..., sc_off:zr_off])  # [B, T, G]
    zero = _u8_to_f32(record[..., zr_off:fa_off])
    fathers = _u8_to_i32(record[..., fa_off:fa_off + 4 * neighbors])
    g = latent_group or latent_dim
    unpack = (quant.unpack_int2_groups if latent_bits == 2
              else quant.unpack_int4_groups)
    latent = unpack(packed, scale, zero, group=g)  # [B, T, latent]
    # up-projection in the COMPUTE dtype (bf16 on chip: native MXU rate;
    # f32 on the CPU parity tests keeps the identity codec exact)
    mm_dtype = ce_sl.dtype
    residual = comp_ops.reconstruct_up(
        jax.tree_util.tree_map(lambda w: w.astype(mm_dtype),
                               comp_layer["up"]),
        arch, latent.astype(mm_dtype),
    ).astype(jnp.float32)  # [B, T, io]
    kvdim = nkv * 2 * dh
    ncmax = ce_sl.shape[1]
    # refs = mean of NN father centers — as a ONE-HOT MATMUL against the
    # (small, VMEM-friendly) centers table instead of a row gather: the
    # gather+convert+mean chain traced at 1.27 ms/layer/step (the whole
    # deltakv decode wall); [T, NC] x [NC, KV] runs on the MXU at ~0.2 ms.
    # Duplicate fathers (early tokens) contribute multiple 1/NN weights —
    # identical semantics to the mean over the gathered rows.
    nnb = fathers.shape[-1]
    fa = jnp.clip(fathers, 0, ncmax - 1)
    # one-hot whenever the [T, NC] matrix is modest: small center tables
    # (any T) or PAD-sized selections (any table — the recon cache's
    # per-step drift reconstructs <=512 tokens, where the flat-take path's
    # row gathers are the wall: 4 takes x 26 layers traced ~1 ms/layer
    # while the [512, NC]x[NC, KV] matmul is ~0.1 ms of MXU)
    if ncmax <= 2048 or t <= 1024:
        # one-hot MXU matmul
        cen = ce_sl[rows]  # [B, NCmax, KV] (flat storage)
        onehot = (
            fa[..., None]
            == jnp.arange(ncmax, dtype=jnp.int32)[None, None, None, :]
        )
        # father COUNTS (small ints, exact in bf16) feed the MXU matmul;
        # the 1/NN mean divides AFTER, in the f32 accumulator — for
        # non-pow2 NN a bf16 pre-divide weight is not representable and
        # this path would diverge from the large-table branch (which
        # averages flat f32 takes) exactly at the ncmax==2048 boundary.
        a_cnt = onehot.astype(cen.dtype).sum(axis=2)  # [B, T, NC]
        refs = jnp.einsum(
            "btn,bnk->btk", a_cnt, cen,
            preferred_element_type=jnp.float32,
        ) / nnb  # [B, T, KV] f32
    else:
        # big center tables (128K+): the matmul is O(T*NC*KV) and loses;
        # NN separate FLAT row takes summed — no [T, NN, KV] intermediate
        # and no whole-table slice copies, context-free cost
        cen_flat = ce_sl.reshape(-1, kvdim)
        base_row = rows[:, None] * ncmax
        acc = None
        for j in range(nnb):
            gj = jnp.take(
                cen_flat, base_row + fa[:, :, j], axis=0
            ).astype(jnp.float32)  # [B, T, KV]
            acc = gj if acc is None else acc + gj
        refs = acc / nnb
    kv_hat = (residual + refs).reshape(b, t, nkv, 2 * dh).astype(mm_dtype)
    k_hat, v_hat = kv_hat[..., :dh], kv_hat[..., dh:]
    # Re-RoPE K at absolute positions
    pos = base_pos[:, None] + topk_idx  # [B, T]
    k_hat = rerope(k_hat, jnp.maximum(pos, 0), cos, sin, rot_dim)
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


def reconstructed_attention_stats(
    q: jax.Array,  # [B, Nq, Dh]
    k_hat: jax.Array,  # [B, T, Nkv, Dh] (re-RoPE'd)
    v_hat: jax.Array,
    hat_valid: jax.Array,  # [B, T]
    *,
    sm_scale: float,
):
    """Stats-form attention over ONLY the reconstructed top-k keys.

    The caller merges it with the raw-window result from the paged decode
    KERNEL (ops/attention.merge_attention_stats): concatenating raw+hat
    keys in XLA forced a whole-pool gather whose layout assignment COPIED
    the int4 cache inside the decode scan (1.78 GiB temp at 128K)."""
    b, nq, dh = q.shape
    nkv = k_hat.shape[2]
    g = nq // nkv
    qf = q.reshape(b, nkv, g, dh)
    s = jnp.einsum(
        "bhgd,bkhd->bhgk", qf, k_hat.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * sm_scale
    s = jnp.where(hat_valid[:, None, None, :], s, NEG_INF)
    m = jnp.max(s, axis=-1)  # [B, Nkv, G]
    e = jnp.where(
        hat_valid[:, None, None, :], jnp.exp(s - m[..., None]), 0.0
    )
    l = jnp.sum(e, axis=-1)
    l_safe = jnp.where(l <= 0.0, 1.0, l)
    out = jnp.einsum(
        "bhgk,bkhd->bhgd", (e / l_safe[..., None]).astype(q.dtype),
        v_hat.astype(q.dtype), preferred_element_type=jnp.float32,
    )
    return (
        out.reshape(b, nq, dh).astype(q.dtype),
        m.reshape(b, nq),
        l.reshape(b, nq),
    )


# ===================================================== reconstruction cache
#
# TPU-native answer to the reference's fused reconstruct+writeback kernel
# family (/root/reference/src/sparsevllm/triton_kernel/deltakv_kernels.py:
# 2568-3488): instead of re-running gather->dequant->up-proj->+ref->re-RoPE
# over the WHOLE top-k set every decode step (the r4 lane's ~25 ms/step
# reconstruct wall, PERF_NOTES "DeltaKV measured lane"), keep a persistent
# per-sparse-layer scratch of reconstructed (already re-RoPE'd) K∥V for the
# CURRENT selection and re-reconstruct only the tokens newly entering it.
# Records and centers are immutable once written (compression appends), so
# cached reconstructions are exact — the incremental path is bit-identical
# to the full rebuild. Selection drift between adjacent decode steps is
# tiny, so per-step work drops from O(topk) to O(drift).


def init_recon_cache(num_sparse: int, ngroups: int, rows: int, t: int,
                     nkv: int, dh: int, dtype) -> dict:
    """kv: [NS, rows, T, Nkv*2*Dh] (k_hat flat ∥ v_hat flat, k re-RoPE'd);
    slot_tok: [NG, rows, T] compressed-token id held by each slot (-1 =
    empty; selection groups = full/observation layers, shared by every
    sparse layer in the group)."""
    return {
        "kv": jnp.zeros((num_sparse, rows, t, nkv * 2 * dh), dtype),
        "slot_tok": jnp.full((ngroups, rows, t), -1, jnp.int32),
    }


def recon_group_refresh(prev_tok: jax.Array, new_tok: jax.Array, pad: int):
    """Set-diff the new selection against the cache content (one call per
    observation-layer refresh; shared by all sparse layers of the group).

    prev_tok [B, T]: token per slot (may be -1-filled after invalidation);
    new_tok [B, T]: this step's top-k (distinct positions by construction
    of lax.top_k). Admits AT MOST ``pad`` newly-entering tokens into
    evicted slots (rank-aligned); when drift exceeds ``pad`` (or
    degenerate duplicate content shrinks the evictable set) the cache
    LAGS the selection and catches up ``pad`` tokens per step — lagging
    steps must attend via the full reconstruct path. Returns:
      slot_tok [B, T] — updated slot contents
      new_toks [B, pad] — admitted tokens (tail: junk sentinel)
      new_slots [B, pad] — their slots (tail: T = dropped by scatters)
      admitted [B, T] — True at slots whose CONTENT is admitted this step
        (their cached kv rows are stale until the post-scan scatter; the
        fresh-branch stats cover those tokens within the step)
      lag [B] — cache does not yet hold the full selection
    """
    b, t = new_tok.shape
    prev_s = jnp.sort(prev_tok, axis=-1)
    new_s = jnp.sort(new_tok, axis=-1)

    def member(sorted_a, x):
        j = jnp.clip(
            jax.vmap(jnp.searchsorted)(sorted_a, x), 0, t - 1
        )
        return jnp.take_along_axis(sorted_a, j, axis=-1) == x

    is_new = ~member(prev_s, new_tok)  # [B, T] over new entries
    evict = ~member(new_s, prev_tok)  # [B, T] over slots
    n_new = is_new.sum(-1)
    n_evict = evict.sum(-1)
    admit_n = jnp.minimum(jnp.minimum(n_new, n_evict), pad)  # [B]
    lag = n_new > admit_n

    rows_ix = jnp.arange(b, dtype=jnp.int32)[:, None]
    slot_ids = jnp.broadcast_to(
        jnp.arange(t, dtype=jnp.int32)[None, :], (b, t)
    )
    # rank r -> slot id of the r-th evicted slot
    evict_rank = jnp.cumsum(evict, -1) - 1
    sbr = jnp.full((b, t), t, jnp.int32).at[
        rows_ix, jnp.where(evict, evict_rank, t)
    ].set(slot_ids, mode="drop")
    # compact the first ``admit_n`` new tokens (and their topk positions)
    new_rank = jnp.cumsum(is_new, -1) - 1
    tgt = jnp.where(is_new & (new_rank < admit_n[:, None]), new_rank, pad)
    pos_of_rank = jnp.full((b, pad), t, jnp.int32).at[
        rows_ix, tgt
    ].set(slot_ids, mode="drop")
    filled = pos_of_rank < t  # [B, pad]
    new_toks = jnp.take_along_axis(
        new_tok, jnp.clip(pos_of_rank, 0, t - 1), axis=-1
    )
    new_toks = jnp.where(filled, new_toks, jnp.int32(-(2 ** 30)))
    new_slots = jnp.where(filled, sbr[:, :pad], t)
    slot_tok = prev_tok.at[
        rows_ix, jnp.where(filled, new_slots, t)
    ].set(new_toks, mode="drop")
    admitted = jnp.zeros((b, t), bool).at[
        rows_ix[:, :1].repeat(pad, 1), new_slots
    ].set(filled, mode="drop")
    return slot_tok, new_toks, new_slots, admitted, lag


def recon_pack(k_hat: jax.Array, v_hat: jax.Array, dtype) -> jax.Array:
    """[B, P, Nkv, Dh] x2 -> [B, P, Nkv*2*Dh] (k flat ∥ v flat)."""
    b, p = k_hat.shape[:2]
    return jnp.concatenate(
        [k_hat.reshape(b, p, -1), v_hat.reshape(b, p, -1)], axis=-1
    ).astype(dtype)


def recon_scatter(rc_kv: jax.Array, sl, rows: jax.Array,
                  slots: jax.Array, packed: jax.Array) -> jax.Array:
    """Write packed reconstructions into the layer's scratch rows.

    slots entries == T (pad sentinel) drop; row writes are full
    (sublane, 128)-tile rows, so the scan-carried update stays in place
    (PERF_NOTES layout rule 1)."""
    b, p = slots.shape
    ridx = jnp.broadcast_to(rows[:, None], (b, p))
    slx = jnp.broadcast_to(jnp.asarray(sl, jnp.int32), (b, p))
    return rc_kv.at[slx, ridx, slots].set(packed, mode="drop")


def recon_cached_attention_stats(
    q: jax.Array,  # [B, Nq, Dh]
    kv_slab: jax.Array,  # [B, T, Nkv*2*Dh] cached k_hat ∥ v_hat
    slot_tok: jax.Array,  # [B, T]
    comp_counts: jax.Array,  # [B]
    *,
    nkv: int,
    dh: int,
    sm_scale: float,
    stale: jax.Array | None = None,  # [B, T] slots admitted THIS step
    #   (their cached rows lag the post-scan scatter; the fresh branch
    #   covers those tokens within the step)
):
    """Stats-form attention over the cached reconstructed top-k."""
    b, t = kv_slab.shape[:2]
    k_hat = kv_slab[..., : nkv * dh].reshape(b, t, nkv, dh)
    v_hat = kv_slab[..., nkv * dh:].reshape(b, t, nkv, dh)
    valid = (slot_tok >= 0) & (slot_tok < comp_counts[:, None])
    if stale is not None:
        valid = valid & ~stale
    return reconstructed_attention_stats(
        q, k_hat, v_hat, valid, sm_scale=sm_scale
    )
