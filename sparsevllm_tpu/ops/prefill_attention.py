"""Pallas TPU kernel: chunked-prefill causal flash attention over paged KV.

TPU-native counterpart of the reference varlen prefill kernel
(src/sparsevllm/triton_kernel/context_flashattention_nopad.py:1-302): padded
[B, S] query chunks attend the full paged context (cached prefix + this
chunk, already stored) through the page table.

Grid = (B, S_blocks, K_pages), pages innermost/sequential: the page table
rides in scalar-prefetch SMEM and steers the double-buffered KV DMA pipeline,
exactly like ops/paged_decode.py. Each step DMAs ONE full token-major page
[P, Nkv, Dh] (a head-sliced block would violate Mosaic's tile rule: the
second-minor block dim must be 8-divisible or equal to the array dim) and
loops the Nkv heads STATICALLY inside the kernel — one [BS*G, P] MXU tile per
head, so FLOPs and DMA volume match a per-head grid without illegal blocks.
Online-softmax state for all heads lives stacked in VMEM scratch
([Nkv*BS*G, ...], row = h*BS*G + qi*G + gi) so the finish step reshapes
straight into the [Nkv, BS, G, Dh] output block.

Fully-future pages (causal) and fully-padded query blocks are predicated off
(DMA still streams — context bucketing bounds the waste; causal over-read is
<=2x, same trade the reference's flash kernels make with their rectangular
grids).

Observation-score emission (SnapKV window, reference prefill_score.py) runs
via the XLA reference path — it is only needed on a sequence's final prefill
chunk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import attention_ref as ref

NEG_INF = -1e30


def _prefill_kernel(
    # scalar prefetch
    lidx_ref,  # [1]
    table_ref,  # [B, MP_pad]
    ctx_ref,  # [B] total context incl. this chunk
    new_ref,  # [B] valid new tokens in this chunk
    # blocks: q, then KP k-page refs, KP v-page refs, optional scale planes
    q_ref,  # [1, Nkv, BS, G, Dh]
    k_refs,  # KP x [1, 1, P, Nkv, Dh] (kv dtype or int8; token-major pages)
    v_refs,
    ks_refs,  # KP x [1, 1, 1, Nkv, P] f32 K scales (int2: V scales) or None
    vs_refs,  # KP x ... V scales (int2: V zeros) or None
    kz_refs,  # KP x ... K zeros (int4 only) or None
    vz_refs,
    kch_s_refs,  # KP x [1, 1, 1, P//Gq, Nkv, Dh] KIVI-2 K channel scales
    kch_z_refs,  # KP x ... KIVI-2 K channel zeros (int2 only) or None
    out_ref,  # [1, Nkv, BS, G, Dh]
    # scratch (rows stacked head-major: row = h*BS*G + qi*G + gi)
    acc_ref,  # [Nkv*BS*G, Dh] f32
    m_ref,  # [Nkv*BS*G, 128] f32
    l_ref,  # [Nkv*BS*G, 128] f32
    *,
    sm_scale: float,
    page_size: int,
    block_s: int,
    groups: int,
    nkv: int,
    flat4: bool = False,
):
    """Multi-page superblock flash prefill.

    Each grid step processes KP pages against one query block: the
    online-softmax state update (m/l/acc, ~20 MB of VMEM tile traffic per
    step) amortizes over KP*P tokens instead of P — the kernel is
    VMEM-traffic-bound, not DMA-bound (measured: per-page grid ran at
    <5% of the HBM roofline). Fully-past superblocks skip the causal
    iota/compare masking entirely (the bulk of a long-context prefill).
    """
    b = pl.program_id(0)
    s = pl.program_id(1)
    k_i = pl.program_id(2)
    num_k = pl.num_programs(2)
    kp = len(k_refs)

    @pl.when(k_i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    ctx = ctx_ref[b]
    new = new_ref[b]
    base = ctx - new + s * block_s  # abs position of this block's first query
    rows_h = block_s * groups  # rows per kv head
    sb_tokens = kp * page_size

    # block-level predicates
    q_block_valid = s * block_s < new
    kpos_min = k_i * sb_tokens
    qpos_max = base + block_s - 1
    visible = jnp.logical_and(kpos_min <= qpos_max, kpos_min < ctx)
    # every token of the superblock is causally visible to every valid query
    # AND inside the context: no element masking needed
    fully_past = jnp.logical_and(
        kpos_min + sb_tokens - 1 < base, kpos_min + sb_tokens <= ctx
    )

    mm_dtype = q_ref.dtype

    def _head_slice(ref, sc_ref, zz_ref, hh, ch_s_ref=None, ch_z_ref=None,
                    v2=False):
        """One page's dequantized [P, Dh] tile for head hh (static index)."""
        if flat4:  # int4 FLAT-LANE page [P, Nkv*Dh//2]
            # fold head hh's 64 packed lanes out of the flat row with a
            # 0/1 matmul: static lane slicing at 64-lane offsets is not
            # tile-aligned, while a [P, fd]x[fd, half] mm_dtype pass is
            # exact on byte values (0..255 exact in bf16) and ~4% of the
            # main matmul FLOPs. Nibbles + scales apply per head as in
            # the 5-D int4 path.
            fd = ref.shape[3]
            half = fd // nkv
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (fd, half), 0)
                == hh * half
                + jax.lax.broadcasted_iota(jnp.int32, (fd, half), 1)
            ).astype(mm_dtype)
            ph = jax.lax.dot_general(
                ref[0, 0].astype(mm_dtype), sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            pk = ph.astype(jnp.int32)  # [P, half] exact byte values
            sc = sc_ref[0, 0, 0, hh : hh + 1, :].T  # [P, 1]
            zz = zz_ref[0, 0, 0, hh : hh + 1, :].T
            dlo = (pk & 15).astype(jnp.float32) * sc + zz
            dhi = ((pk >> 4) & 15).astype(jnp.float32) * sc + zz
            return jnp.concatenate([dlo, dhi], axis=1).astype(mm_dtype)
        if ch_s_ref is not None:  # KIVI-2 KEY page [P, Nkv, Dh/4]
            pk = ref[0, 0, :, hh, :].astype(jnp.int32)
            qk = jnp.concatenate(
                [((pk >> (2 * j)) & 3).astype(jnp.float32)
                 for j in range(4)], axis=-1)  # [P, Dh]
            sc = ch_s_ref[0, 0, 0, :, hh, :]  # [P//Gq, Dh]
            zz = ch_z_ref[0, 0, 0, :, hh, :]
            ngrp, dh_full = sc.shape
            qg = qk.reshape(ngrp, page_size // ngrp, dh_full)
            d = qg * sc[:, None] + zz[:, None]
            return d.reshape(page_size, dh_full).astype(mm_dtype)
        if v2:  # KIVI-2 VALUE page (per-token scales, quarter-packed)
            pv = ref[0, 0, :, hh, :].astype(jnp.int32)
            qv = jnp.concatenate(
                [((pv >> (2 * j)) & 3).astype(jnp.float32)
                 for j in range(4)], axis=-1)  # [P, Dh]
            sc = sc_ref[0, 0, 0, hh : hh + 1, :].T  # vs plane -> [P, 1]
            zz = zz_ref[0, 0, 0, hh : hh + 1, :].T  # vz plane
            return (qv * sc + zz).astype(mm_dtype)
        if zz_ref is not None:  # int4 split-half packed [P, Dh/2]
            pk = ref[0, 0, :, hh, :].astype(jnp.int32)
            sc = sc_ref[0, 0, 0, hh : hh + 1, :].T  # [P, 1]
            zz = zz_ref[0, 0, 0, hh : hh + 1, :].T
            dlo = (pk & 15).astype(jnp.float32) * sc + zz
            dhi = ((pk >> 4) & 15).astype(jnp.float32) * sc + zz
            return jnp.concatenate([dlo, dhi], axis=1).astype(mm_dtype)
        x = ref[0, 0, :, hh, :]  # [P, Dh]
        if sc_ref is not None:
            x = (
                x.astype(jnp.float32)
                * sc_ref[0, 0, 0, hh : hh + 1, :].T
            )
        return x.astype(mm_dtype)

    def _cat(refs, sc_refs, zz_refs, hh, ch_s_refs=None, ch_z_refs=None,
             v2=False):
        """KP pages' [P, Dh] tiles stacked -> [KP*P, Dh] (sublane concat)."""
        tiles = [
            _head_slice(refs[j], None if sc_refs is None else sc_refs[j],
                        None if zz_refs is None else zz_refs[j], hh,
                        None if ch_s_refs is None else ch_s_refs[j],
                        None if ch_z_refs is None else ch_z_refs[j], v2)
            for j in range(kp)
        ]
        return tiles[0] if kp == 1 else jnp.concatenate(tiles, axis=0)

    def _compute(masked: bool):
        # scores per head, stacked along rows (static head loop; each slice
        # is a static index — no dynamic sublane slicing)
        quant2 = kch_s_refs is not None
        sts = []
        for hh in range(nkv):
            q_h = q_ref[0, hh].reshape(rows_h, -1)
            if quant2:
                k_h = _cat(k_refs, None, None, hh, kch_s_refs, kch_z_refs)
            else:
                k_h = _cat(k_refs, ks_refs, kz_refs, hh)  # [KP*P, Dh]
            sts.append(jax.lax.dot_general(
                q_h, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        st = jnp.concatenate(sts, axis=0) * sm_scale  # [Nkv*BSG, KP*P]

        if masked:
            row = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
            qi = (row % rows_h) // groups  # query index within block
            qpos = base + qi
            kpos = kpos_min + jax.lax.broadcasted_iota(
                jnp.int32, st.shape, 1
            )
            valid = (kpos <= qpos) & (kpos < ctx) & (s * block_s + qi < new)
            st = jnp.where(valid, st, NEG_INF)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(st, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(st - m_new)
        if masked:
            p = jnp.where(valid, p, 0.0)
        pvs = []
        p_mm = p.astype(mm_dtype)  # bf16 probs: standard flash practice
        for hh in range(nkv):
            if quant2:
                # KIVI-2: the (ks, vs) slots carry the V (scale, zero) planes
                v_h = _cat(v_refs, ks_refs, vs_refs, hh, v2=True)
            else:
                v_h = _cat(v_refs, vs_refs, vz_refs, hh)
            pvs.append(jax.lax.dot_general(
                p_mm[hh * rows_h : (hh + 1) * rows_h], v_h,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        pv = jnp.concatenate(pvs, axis=0)  # [Nkv*BSG, Dh]
        acc_ref[:] = acc_ref[:] * alpha + pv
        l_ref[:] = jnp.broadcast_to(
            l_prev * alpha + jnp.sum(p, axis=1, keepdims=True), l_ref.shape
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    compute = _compute

    @pl.when(jnp.logical_and(q_block_valid, fully_past))
    def _fast():
        compute(masked=False)

    @pl.when(jnp.logical_and(
        q_block_valid, jnp.logical_and(visible, jnp.logical_not(fully_past))
    ))
    def _boundary():
        compute(masked=True)

    @pl.when(k_i == num_k - 1)
    def _finish():
        l = l_ref[:, :1]
        l_safe = jnp.where(l <= 0.0, 1.0, l)
        out = acc_ref[:] / l_safe  # [Nkv*BSG, Dh]
        # zero padded query rows (parity with ref's probs *= valid_q)
        row = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
        qi = (row % rows_h) // groups
        out = jnp.where(s * block_s + qi < new, out, 0.0)
        out_ref[0] = out.reshape(out_ref.shape[1:]).astype(out_ref.dtype)


def _bind_kernel(kp: int, quantized: bool, quant4: bool,
                 quant2: bool = False, **kw):
    """Positional-ref binder: [q, KP*k, KP*v, (KP*ks, KP*vs[, KP*kz,
    KP*vz][, KP*kch_s, KP*kch_z])], out, 3 scratch refs. KIVI-2 (quant2):
    the (ks, vs) slots carry the V (scale, zero) planes."""

    def kern(lidx_ref, table_ref, ctx_ref, new_ref, q_ref, *rest):
        rest = list(rest)
        k_refs = [rest.pop(0) for _ in range(kp)]
        v_refs = [rest.pop(0) for _ in range(kp)]
        ks_refs = vs_refs = kz_refs = vz_refs = None
        kch_s_refs = kch_z_refs = None
        if quantized:
            ks_refs = [rest.pop(0) for _ in range(kp)]
            vs_refs = [rest.pop(0) for _ in range(kp)]
        if quant4:
            kz_refs = [rest.pop(0) for _ in range(kp)]
            vz_refs = [rest.pop(0) for _ in range(kp)]
        if quant2:
            kch_s_refs = [rest.pop(0) for _ in range(kp)]
            kch_z_refs = [rest.pop(0) for _ in range(kp)]
        out_ref, acc_ref, m_ref, l_ref = rest
        _prefill_kernel(
            lidx_ref, table_ref, ctx_ref, new_ref, q_ref, k_refs, v_refs,
            ks_refs, vs_refs, kz_refs, vz_refs, kch_s_refs, kch_z_refs,
            out_ref, acc_ref, m_ref, l_ref, **kw,
        )

    return kern


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "block_s", "block_pages", "interpret"),
)
def _prefill_pallas(
    q, k_cache, v_cache, layer_idx, page_table, ctx_lens, new_lens,
    kv_scales=None, k_ch_scales=None,
    *, sm_scale, block_s, block_pages=4, interpret=False,
):
    b, s, nq, dh = q.shape
    quantized = kv_scales is not None
    quant2 = k_ch_scales is not None
    quant4 = quantized and not quant2 and kv_scales.shape[0] == 4
    if quant4:
        # FLAT-LANE int4 cache [L, pages, P, Nkv*Dh//2] (quant.py int4
        # section) — served by the windowed-QK path (_flat4_compute)
        l, pages, p, fd = k_cache.shape
        nkv = kv_scales.shape[3]
        cdh = fd // nkv
    else:
        l, pages, p, nkv, cdh = k_cache.shape  # cdh = Dh | Dh/4 (int2)
    mp = page_table.shape[1]
    g = nq // nkv
    kp = min(block_pages, mp)
    mp_pad = -(-mp // kp) * kp
    if mp_pad != mp:
        # padded entries -> trash page 0; the kernel masks kpos >= ctx
        page_table = jnp.pad(page_table, ((0, 0), (0, mp_pad - mp)))

    lidx = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    # [B, Nkv, S, G, Dh]: GQA group as a full (block == array) trailing dim
    # satisfies Mosaic's (8, 128) tile rule for any G (see paged_decode.py).
    q5 = q.reshape(b, s, nkv, g, dh).transpose(0, 2, 1, 3, 4)

    def kv_imap(j):
        def imap(bb, si, ki, lidx_ref, table_ref, *_):
            return (lidx_ref[0], table_ref[bb, ki * kp + j], 0, 0, 0)
        return imap

    def kv_imap4(j):  # flat-lane 4-D int4 cache
        def imap(bb, si, ki, lidx_ref, table_ref, *_):
            return (lidx_ref[0], table_ref[bb, ki * kp + j], 0, 0)
        return imap

    def q_imap(bb, si, ki, *_):
        return (bb, 0, si, 0, 0)

    in_specs = [
        pl.BlockSpec((1, nkv, block_s, g, dh), q_imap,
                     memory_space=pltpu.VMEM),
    ]
    args = [q5]
    kv_block = (1, 1, p, nkv * cdh) if quant4 else (1, 1, p, nkv, cdh)
    for cache in (k_cache, v_cache):
        for j in range(kp):
            in_specs.append(pl.BlockSpec(
                kv_block, kv_imap4(j) if quant4 else kv_imap(j),
                memory_space=pltpu.VMEM))
            args.append(cache)
    if quantized:
        def plane_imap(plane, j):
            def imap(bb, si, ki, lidx_ref, table_ref, *_):
                return (plane, lidx_ref[0], table_ref[bb, ki * kp + j],
                        0, 0)
            return imap

        for plane in ([0, 1, 2, 3] if quant4 else [0, 1]):
            for j in range(kp):
                # [Nkv, P] blocks: one exact (8,128) tile per page (the
                # [P, Nkv] form padded 16x in VMEM/DMA); per-head rows
                # transpose in-register inside the kernel.
                in_specs.append(pl.BlockSpec((1, 1, 1, nkv, p),
                                             plane_imap(plane, j),
                                             memory_space=pltpu.VMEM))
                args.append(kv_scales)
    if quant2:
        ngrp = k_ch_scales.shape[3]

        def ch_plane_imap(plane, j):
            def imap(bb, si, ki, lidx_ref, table_ref, *_):
                return (plane, lidx_ref[0], table_ref[bb, ki * kp + j],
                        0, 0, 0)
            return imap

        for plane in (0, 1):
            for j in range(kp):
                in_specs.append(pl.BlockSpec((1, 1, 1, ngrp, nkv, dh),
                                             ch_plane_imap(plane, j),
                                             memory_space=pltpu.VMEM))
                args.append(k_ch_scales)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, s // block_s, mp_pad // kp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, nkv, block_s, g, dh), q_imap, memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((nkv * block_s * g, dh), jnp.float32),
            pltpu.VMEM((nkv * block_s * g, 128), jnp.float32),
            pltpu.VMEM((nkv * block_s * g, 128), jnp.float32),
        ],
    )
    kernel = _bind_kernel(
        kp, quantized, quant4, quant2, sm_scale=sm_scale, page_size=p,
        block_s=block_s, groups=g, nkv=nkv, flat4=quant4,
    )
    out5 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q5.shape, q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # batch/S-block iterations are independent (scratch re-inits at
            # ki==0); superblocks are a sequential reduction
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * s * nq * mp * p * dh,
            bytes_accessed=b * nkv * mp * p * dh * 2 * k_cache.dtype.itemsize
            + 2 * b * s * nq * dh * q.dtype.itemsize,
            transcendentals=b * s * nq * mp * p,
        ),
    )(lidx, page_table, ctx_lens, new_lens, *args)
    return out5.transpose(0, 2, 1, 3, 4).reshape(b, s, nq, dh)


def prefill_attention_pallas(
    q, k_cache, v_cache, layer_idx, page_table, ctx_lens, new_lens,
    *, sm_scale, obs_window=0, score_pooling=0, kv_scales=None,
    k_ch_scales=None, interpret=None,
):
    """Dispatcher-facing API (matches ops.attention.prefill_attention).

    Score-emitting calls (final SnapKV chunk) run the main attention through
    the flash kernel and the observation scores through the blockwise
    two-pass op (ref.prefill_obs_scores_blockwise) — exact softmax scores
    with O(W * block) memory at any context length. (The naive ref obs path
    materializes [B, Nq, S, K]: 6.4 GiB at K=128K — unusable on chip.)
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if obs_window > 0:
        if k_ch_scales is not None:
            raise NotImplementedError(
                "KIVI-2 caches do not serve prefill observation scores "
                "(int2 is scoped to methods without obs windows)"
            )
        def _layer(c):
            return jax.lax.dynamic_index_in_dim(c, layer_idx, 0,
                                                keepdims=False)
        lsc = None if kv_scales is None else kv_scales[:, layer_idx]
        out, _ = prefill_attention_pallas(
            q, k_cache, v_cache, layer_idx, page_table, ctx_lens, new_lens,
            sm_scale=sm_scale, obs_window=0, kv_scales=kv_scales,
            interpret=interpret,
        )
        obs = ref.prefill_obs_scores_blockwise(
            q, _layer(k_cache), page_table, ctx_lens, new_lens,
            sm_scale=sm_scale, obs_window=obs_window,
            score_pooling=score_pooling, kv_scales=lsc,
        )
        return out, obs
    s = q.shape[1]
    # block_s MUST stay large: every S-block re-streams the whole context
    # from HBM, so halving block_s doubles prefill DMA. Start from a
    # power of 2 (chunk sizes are bucketed to powers of 2) so the
    # divides-s reduction loop does not degenerate (a non-divisor start
    # like 80 collapses to block_s=2 -> 40x DMA amplification, measured
    # 550 ms/layer vs ~14 ms at block_s=64).
    # Block sizes from the on-chip sweep (scripts/sweep_prefill_blocks.py,
    # 64K ctx x 8K chunk, v5e): the kernel is VMEM-state-traffic bound, so
    # bigger query tiles AND bigger page superblocks both amortize the
    # online-softmax state update. bf16: bs=512/KP=8 = 95 ms/layer (was
    # 195 at 256/4). int4: bs=512/KP=4 = 175 ms (KP=8 with 4 scale planes
    # exceeds the VMEM budget and fails Mosaic compile).
    quantized = kv_scales is not None
    block_s = min(s, 512)
    # VMEM scratch scales with block_s * Nq rows: the 512-tile budget was
    # sized at Nq=24 (3B-class); 28-head (7B-class) int4 exceeded the
    # 100 MB scoped limit by 8 MB — cap rows at the 512x24 envelope.
    nq_ = q.shape[2]
    while block_s > 64 and block_s * nq_ > 512 * 24:
        block_s //= 2
    while s % block_s:
        block_s //= 2
    out = _prefill_pallas(
        q, k_cache, v_cache, layer_idx, page_table, ctx_lens, new_lens,
        kv_scales, k_ch_scales, sm_scale=sm_scale, block_s=block_s,
        block_pages=4 if quantized else 8, interpret=interpret,
    )
    return out, None
