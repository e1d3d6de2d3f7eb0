"""Pallas TPU kernel: paged flash-decode attention (GQA/MHA).

TPU-native counterpart of the reference 2-stage flash-decode family
(src/sparsevllm/triton_kernel/gqa_flash_decoding_stage1.py:1-433 +
flash_decoding_stage1/2.py): one decode query token per sequence attends a
paged KV cache addressed through a page table.

Design (single-pass online softmax instead of the reference's 2-stage
split-KV): grid = (B, MP) with the page dimension innermost and sequential.
The page table rides in scalar-prefetch SMEM so each grid step's BlockSpec
index_map points the automatic double-buffered DMA pipeline at the full
[page_size, Nkv, head_dim] token-major page of layer ``layer_idx`` — one
contiguous ~128 KiB DMA per step (small per-head tiles would leave the HBM
DMA engines underutilized).

All q heads are processed in a single [Nq, P*Nkv] MXU matmul with a
head-match mask (query head r//G only attends key columns of kv head c%Nkv;
cross-head lanes are masked to zero so the p@V matmul still sums correctly).
The Nkv-fold padding FLOPs are free: decode is HBM-bandwidth-bound
(arithmetic intensity << the MXU's 240 flops/byte break-even).

Score emission (OmniKV/DeltaKV observation layers) happens in the SAME
sweep: with ``emit_raw`` the kernel writes per-page raw token expsums (a
0/1-matmul fold of the probability tile) plus the page-local running max,
and a late-normalization pass outside rescales by exp(m_page - m_final) /
l_final — exact softmax scores without a second K sweep (a separate score
pass measured slower than the ref gather it replaced).

int8/int4 KV dequantize whole pages in-kernel from raw [Nkv, P] scale
(+zero) blocks; ``return_stats`` additionally emits the final online-softmax
(m, l) so callers can merge extra tokens exactly outside the kernel (the
quantized decode path defers the current token this way).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import attention_ref as ref

NEG_INF = -1e30


def _flat4_step(
    q_ref, k_refs, v_refs, ks_refs, vs_refs, kz_refs, vz_refs,
    mask_ref, raw_ref, mraw_ref, acc_ref, m_ref, l_ref,
    *, pages, ctx, sm_scale, page_size, groups, has_mask,
):
    """Windowed-QK online-softmax update over R FLAT-LANE int4 pages.

    Pages are [P, Nkv*Dh//2] int8 (lane f = h*Dh//2 + j; split-half
    nibbles). Head matching happens structurally: q scatters into zeroed
    per-head lane windows of [Nq, Nkv*Dh] (0/1 iota matmuls) so cross-head
    products vanish — scores come out [Nq, R*P] per TOKEN with no head
    mask and no Mosaic relayout of the flat pages (see _decode_kernel
    docstring)."""
    mm_dtype = q_ref.dtype
    q = q_ref[0]  # [Nq, Dh]
    nq, dh = q.shape
    nkv = ks_refs[0].shape[3]
    half = dh // 2
    fd = nkv * half  # packed lanes per page row
    fd2 = 2 * fd  # unpacked (windowed) lanes = Nkv*Dh
    r = len(k_refs)

    # windowed lane axis maps: lane f < fd -> (head f//half, channel
    # f%half) from the LO nibble; f >= fd -> (head (f-fd)//half, channel
    # half + (f-fd)%half) from the HI nibble.
    fi = jax.lax.broadcasted_iota(jnp.int32, (dh, fd2), 1)
    di = jax.lax.broadcasted_iota(jnp.int32, (dh, fd2), 0)
    chan = jnp.where(fi < fd, fi % half, half + (fi - fd) % half)
    e_f32 = (chan == di).astype(jnp.float32)  # [Dh, Nkv*Dh] chan scatter

    ri = jax.lax.broadcasted_iota(jnp.int32, (nq, fd2), 0)
    fi2 = jax.lax.broadcasted_iota(jnp.int32, (nq, fd2), 1)
    headf = jnp.where(fi2 < fd, fi2 // half, (fi2 - fd) // half)
    own = headf == ri // groups  # [Nq, Nkv*Dh] per-row head window

    # HIGHEST (exact fp32 contraction) only for f32 parity inputs — Mosaic
    # rejects fp32 contract precision on bf16 operands; in bf16 serving
    # the 0/1 placement is exact at default precision anyway.
    q_prec = (jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32
              else jax.lax.Precision.DEFAULT)
    qw = jax.lax.dot_general(
        q, e_f32.astype(mm_dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=q_prec,
    )
    qw = jnp.where(own, qw, 0.0).astype(mm_dtype)  # [Nq, Nkv*Dh]

    # per-(token, head) scale/zero -> packed-lane expansion (0/1 matmul:
    # lane repeat-by-half is awkward in Mosaic, a [P,Nkv]x[Nkv,fd] MXU
    # pass is free)
    hsel = (
        jax.lax.broadcasted_iota(jnp.int32, (nkv, fd), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (nkv, fd), 1) // half
    ).astype(jnp.float32)

    def _dq(ref, sc_ref, zz_ref):
        pk = ref[0, 0].astype(jnp.int32)  # [P, fd]
        sc_e = jax.lax.dot_general(
            sc_ref[0, 0, 0].T, hsel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [P, fd]
        zz_e = jax.lax.dot_general(
            zz_ref[0, 0, 0].T, hsel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dlo = (pk & 15).astype(jnp.float32) * sc_e + zz_e
        dhi = ((pk >> 4) & 15).astype(jnp.float32) * sc_e + zz_e
        return jnp.concatenate([dlo, dhi], axis=1).astype(mm_dtype)

    k = jnp.concatenate(
        [_dq(kr, ks, kz) for kr, ks, kz in zip(k_refs, ks_refs, kz_refs)],
        axis=0,
    )  # [R*P, Nkv*Dh]
    s = jax.lax.dot_general(
        qw, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale  # [Nq, R*P] — per TOKEN
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    off = col % page_size
    pos = off
    for j, lp in enumerate(pages):
        pos = jnp.where(col // page_size == j, lp * page_size + off, pos)
    valid = pos < ctx
    if has_mask:
        mcols = jnp.concatenate(
            [mask_ref[0, j] for j in range(r)], axis=1
        )  # [1, R*P]
        valid = valid & (mcols.astype(jnp.int32) != 0)
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.where(valid, jnp.exp(s - m_new), 0.0)  # [Nq, R*P] f32
    v = jnp.concatenate(
        [_dq(vr, vs, vz) for vr, vs, vz in zip(v_refs, vs_refs, vz_refs)],
        axis=0,
    )  # [R*P, Nkv*Dh]
    pvw = jax.lax.dot_general(
        p.astype(mm_dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Nq, Nkv*Dh]
    # fold each row's own head window back to [Nq, Dh]. mm_dtype operands:
    # f32+HIGHEST is exact for parity inputs; bf16 costs one rounding of
    # values that leave the kernel in bf16 anyway (f32 HIGHEST here would
    # run the fold at the fp32 MXU rate — measured parity-only luxury).
    pv = jax.lax.dot_general(
        jnp.where(own, pvw, 0.0).astype(mm_dtype), e_f32.astype(mm_dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=q_prec,
    )  # [Nq, Dh]
    acc_ref[:] = acc_ref[:] * alpha + pv
    l_ref[:] = jnp.broadcast_to(
        l_prev * alpha + jnp.sum(p, axis=1, keepdims=True), l_ref.shape
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    if raw_ref is not None:
        # p is already per-token: per-page raw expsums are direct slices
        for j in range(r):
            raw_ref[0, j] = p[:, j * page_size:(j + 1) * page_size]
            mraw_ref[0, j] = jnp.broadcast_to(m_new, mraw_ref.shape[2:])


def _decode_kernel(
    # scalar prefetch
    lidx_ref,  # [1] layer index
    table_ref,  # [B, MPr*R] page table (padded to a multiple of R)
    ctx_ref,  # [B] context lengths
    ppos_ref,  # [B, MPr*R] logical page index of each table entry (identity
    #            for dense tables; Quest compacted tables permute pages;
    #            padding entries hold a huge sentinel -> masked out)
    # blocks
    q_ref,  # [1, Nq, Dh]
    k_refs,  # R x [1, 1, P, Nkv, Dh] (kv dtype or int8; token-major)
    v_refs,  # R x [1, 1, P, Nkv, Dh]
    ks_refs,  # R x [1, 1, 1, Nkv, P] f32 K scales (int2: V scales) (or None)
    vs_refs,  # R x [1, 1, 1, Nkv, P] f32 V scales (int2: V zeros) (or None)
    kz_refs,  # R x [1, 1, 1, Nkv, P] f32 K zeros (int4 only, or None)
    vz_refs,  # R x [1, 1, 1, Nkv, P] f32 V zeros (int4 only, or None)
    kch_s_refs,  # R x [1, 1, 1, P//G, Nkv, Dh] f32 KIVI-2 per-channel K
    kch_z_refs,  # R x ... K channel zeros (int2 only, or None)
    mask_ref,  # [1, R, 1, P*Nkv] int8 select mask, pre-expanded (or None)
    out_ref,  # [1, Nq, Dh]
    mo_ref,  # [1, Nq, 128] f32 final running max (or None)
    lo_ref,  # [1, Nq, 128] f32 final sumexp (or None)
    raw_ref,  # [1, R, Nq, P] f32 per-page raw token expsums (or None)
    mraw_ref,  # [1, R, Nq, 128] f32 running max AT this step (or None)
    # scratch
    acc_ref,  # [Nq, Dh] f32
    m_ref,  # [Nq, 128] f32 (running max, lane-replicated)
    l_ref,  # [Nq, 128] f32 (running sumexp)
    *,
    sm_scale: float,
    page_size: int,
    groups: int,
    has_mask: bool,
    flat4: bool = False,
):
    """One grid step processes R pages: R concurrent page DMAs fold into a
    single [Nq, R*P*Nkv] MXU matmul + ONE online-softmax update (R-fold
    fewer VPU bookkeeping rounds and deeper DMA queues than page-at-a-time
    — the difference between ~50% and ~80+% of HBM peak at bs=8).

    ``flat4`` (int4): pages arrive FLAT-LANE [P, Nkv*Dh//2] (lane f =
    h*Dh//2 + j; ops/quant.py int4 section) and the kernel runs the
    WINDOWED-QK scheme instead of the head-match mask: queries scatter
    into zeroed per-head lane windows of a [Nq, Nkv*Dh] operand (0/1 iota
    matmul), dequantized K/V stay [P, Nkv*Dh] with heads as contiguous
    64-lane windows, and one matmul contracts the full windowed lane axis
    — cross-head products vanish against the zero windows, so scores are
    [Nq, R*P] per token with NO head mask, identical numerics, identical
    FLOPs (8x narrower output x 8x deeper contraction), and zero Mosaic
    relayouts of the flat pages."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    num_chunks = pl.num_programs(1)
    r = len(k_refs)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    ctx = ctx_ref[b]
    pages = [ppos_ref[b, i * r + j] for j in range(r)]
    first_pos = pages[0] * page_size
    for lp in pages[1:]:
        first_pos = jnp.minimum(first_pos, lp * page_size)

    # skip steps whose every page starts past the context
    @pl.when(first_pos < ctx)
    def _compute():
        if flat4:
            _flat4_step(
                q_ref, k_refs, v_refs, ks_refs, vs_refs, kz_refs, vz_refs,
                mask_ref, raw_ref, mraw_ref, acc_ref, m_ref, l_ref,
                pages=pages, ctx=ctx, sm_scale=sm_scale,
                page_size=page_size, groups=groups, has_mask=has_mask,
            )
            return
        # bf16 MXU operands (f32 accumulate via preferred_element_type);
        # f32 inputs (CPU parity tests) keep exact f32 math.
        mm_dtype = q_ref.dtype
        q = q_ref[0]  # [Nq, Dh]
        nkv = k_refs[0].shape[3]

        def _dequant_page(ref, sc_ref, zz_ref, ch_s_ref=None, ch_z_ref=None,
                          v2=False):
            """Whole-page fused dequant -> [P*Nkv, Dh] mm-dtype rows
            (row = offset*Nkv + h). int8: minor-singleton scale broadcast
            (Mosaic supports this; it rejects both flat-fold reshapes —
            and with scales in the megastep scan carry an OUTSIDE flat
            view re-materialized a relayout per layer, ~57 ms/step).
            int4: split-half nibble unpack + scale/zero, halves
            concatenated along lanes (ops/quant.py quantize_rows_u4).
            int2 (KIVI-2): quarter unpack along lanes; K applies
            per-CHANNEL token-group scales ([P//G, Nkv, Dh] blocks), V
            per-token scales (sc_ref/zz_ref planes reused as vs/vz)."""
            if ch_s_ref is not None:  # KIVI-2 KEY page [P, Nkv, Dh/4]
                pk = ref[0, 0].astype(jnp.int32)
                qk = jnp.concatenate(
                    [((pk >> (2 * j)) & 3).astype(jnp.float32)
                     for j in range(4)], axis=-1)  # [P, Nkv, Dh]
                sc = ch_s_ref[0, 0, 0]  # [P//G, Nkv, Dh]
                zz = ch_z_ref[0, 0, 0]
                ngrp = sc.shape[0]
                dh_full = qk.shape[-1]
                qg = qk.reshape(ngrp, page_size // ngrp, nkv, dh_full)
                d = qg * sc[:, None] + zz[:, None]
                return d.reshape(page_size * nkv, dh_full).astype(mm_dtype)
            if v2:  # KIVI-2 VALUE page (per-token scales, quarter-packed)
                pv = ref[0, 0].astype(jnp.int32)
                qv = jnp.concatenate(
                    [((pv >> (2 * j)) & 3).astype(jnp.float32)
                     for j in range(4)], axis=-1)  # [P, Nkv, Dh]
                sc = sc_ref[0, 0, 0].T[:, :, None]  # vs plane
                zz = zz_ref[0, 0, 0].T[:, :, None]  # vz plane
                d = qv * sc + zz
                return d.reshape(page_size * nkv, -1).astype(mm_dtype)
            if zz_ref is not None:  # int4 packed [P, Nkv, Dh/2]
                pk = ref[0, 0].astype(jnp.int32)
                sc = sc_ref[0, 0, 0].T[:, :, None]
                zz = zz_ref[0, 0, 0].T[:, :, None]
                half = ref.shape[4]
                dlo = ((pk & 15).astype(jnp.float32) * sc + zz).reshape(
                    page_size * nkv, half)
                dhi = (((pk >> 4) & 15).astype(jnp.float32) * sc
                       + zz).reshape(page_size * nkv, half)
                return jnp.concatenate([dlo, dhi], axis=1).astype(mm_dtype)
            x3 = ref[0, 0]  # [P, Nkv, Dh]
            if sc_ref is not None:
                x3 = (
                    x3.astype(jnp.float32)
                    * sc_ref[0, 0, 0].T[:, :, None]
                )
            return x3.reshape(page_size * nkv, -1).astype(mm_dtype)

        # ONE [Nq, R*P*Nkv] MXU matmul over the R token-major pages with a
        # head-match mask (see module docstring) — wasted cross-head FLOPs
        # are free, decode is HBM-bound.
        # KIVI-2 convention: ks_refs/vs_refs carry the V (scale, zero)
        # planes; K channel params ride in kch_s/kch_z_refs.
        quant2 = kch_s_refs[0] is not None
        k = jnp.concatenate(
            [_dequant_page(kr, None, None, chs, chz)
             if quant2 else _dequant_page(kr, ks, kz)
             for kr, ks, kz, chs, chz
             in zip(k_refs, ks_refs, kz_refs, kch_s_refs, kch_z_refs)],
            axis=0,
        )  # [R*P*Nkv, Dh], row = (j*P + offset)*Nkv + h
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # [Nq, R*P*Nkv]
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        off = (col % (page_size * nkv)) // nkv
        # per-column token position: page j's logical page (scalar) + off
        pos = off
        for j, lp in enumerate(pages):
            in_j = col // (page_size * nkv) == j
            pos = jnp.where(in_j, lp * page_size + off, pos)
        valid = (row // groups == col % nkv) & (pos < ctx)
        if has_mask:
            # mask pre-expanded to [R, P*Nkv] outside the kernel
            # (repeat_interleave by Nkv: free in XLA, awkward here).
            mcols = jnp.concatenate(
                [mask_ref[0, j] for j in range(r)], axis=1
            )  # [1, R*P*Nkv]
            valid = valid & (mcols.astype(jnp.int32) != 0)
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_ref[:, :1]  # [Nq, 1]
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        v = jnp.concatenate(
            [_dequant_page(vr, ks, vs, v2=True)
             for vr, ks, vs in zip(v_refs, ks_refs, vs_refs)]
            if quant2 else
            [_dequant_page(vr, vs, vz) for vr, vs, vz
             in zip(v_refs, vs_refs, vz_refs)], axis=0
        )  # [R*P*Nkv, Dh]
        pv = jax.lax.dot_general(
            p.astype(mm_dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Nq, Dh] (cross-head lanes are zero in p)
        acc_ref[:] = acc_ref[:] * alpha + pv
        l_ref[:] = jnp.broadcast_to(
            l_prev * alpha + jnp.sum(p, axis=1, keepdims=True), l_ref.shape
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        if raw_ref is not None:
            # per-page raw token expsums under THIS STEP's running max
            # (exact: the outside pass rescales by exp(m_step - m_final)
            # / l_final and sums over q heads — score emission without a
            # second K sweep). fold [Nq, P*Nkv] -> [Nq, P] with a 0/1
            # matmul (Mosaic cannot reshape lanes into sublanes).
            er = jax.lax.broadcasted_iota(
                jnp.int32, (page_size * nkv, page_size), 0)
            ec = jax.lax.broadcasted_iota(
                jnp.int32, (page_size * nkv, page_size), 1)
            fold = (er // nkv == ec).astype(jnp.float32)
            for j in range(r):
                pj = p[:, j * page_size * nkv:(j + 1) * page_size * nkv]
                raw_ref[0, j] = jax.lax.dot_general(
                    pj, fold, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                mraw_ref[0, j] = jnp.broadcast_to(
                    m_new, mraw_ref.shape[2:]
                )

    @pl.when(first_pos >= ctx)
    def _skip_scores():
        # steps entirely past the context emit nothing (the outside
        # rescale treats NEG_INF page-max as zero contribution)
        if raw_ref is not None:
            raw_ref[0] = jnp.zeros_like(raw_ref[0])
            mraw_ref[0] = jnp.full_like(mraw_ref[0], NEG_INF)

    @pl.when(i == num_chunks - 1)
    def _finish():
        l = l_ref[:, :1]
        l_safe = jnp.where(l <= 0.0, 1.0, l)
        out_ref[0] = (acc_ref[:] / l_safe).astype(out_ref.dtype)
        if mo_ref is not None:
            mo_ref[0] = m_ref[:]
            lo_ref[0] = l_ref[:]


def _make_kernel(has_mask: bool, quantized: bool, stats: bool,
                 raw: bool, quant4: bool = False, quant2: bool = False,
                 r: int = 1, **kw):
    kw.setdefault("flat4", quant4)
    """Bind the optional-ref layout: blocks arrive positionally in in_specs
    order [q, R x (k, v, (ks, vs[, kz, vz][, kch_s, kch_z])), (mask)], then
    outputs [out, (m, l), (raw, mraw)], then 3 scratch refs. In KIVI-2 mode
    (quant2) the (ks, vs) slots carry the V (scale, zero) planes."""

    def kern(lidx_ref, table_ref, ctx_ref, ppos_ref, q_ref, *rest):
        rest = list(rest)
        k_refs, v_refs = [], []
        ks_refs, vs_refs, kz_refs, vz_refs = [], [], [], []
        kch_s_refs, kch_z_refs = [], []
        for _ in range(r):
            k_refs.append(rest.pop(0))
            v_refs.append(rest.pop(0))
            ks_refs.append(rest.pop(0) if quantized else None)
            vs_refs.append(rest.pop(0) if quantized else None)
            kz_refs.append(rest.pop(0) if quant4 else None)
            vz_refs.append(rest.pop(0) if quant4 else None)
            kch_s_refs.append(rest.pop(0) if quant2 else None)
            kch_z_refs.append(rest.pop(0) if quant2 else None)
        mask_ref = rest.pop(0) if has_mask else None
        out_ref = rest.pop(0)
        mo_ref = rest.pop(0) if stats else None
        lo_ref = rest.pop(0) if stats else None
        raw_ref = rest.pop(0) if raw else None
        mraw_ref = rest.pop(0) if raw else None
        acc_ref, m_ref, l_ref = rest
        _decode_kernel(
            lidx_ref, table_ref, ctx_ref, ppos_ref, q_ref, k_refs, v_refs,
            ks_refs, vs_refs, kz_refs, vz_refs, kch_s_refs, kch_z_refs,
            mask_ref, out_ref, mo_ref, lo_ref, raw_ref, mraw_ref, acc_ref,
            m_ref, l_ref, has_mask=has_mask, **kw,
        )

    return kern


def _decode_pallas_impl(
    q, k_cache, v_cache, layer_idx, page_table, ctx_lens, select_mask,
    page_pos=None, kv_scales=None, k_ch_scales=None, *, sm_scale,
    interpret=False, return_stats=False, emit_raw=False,
    emit_raw_stats=False,
):
    if emit_raw:
        return_stats = True
    b, nq, dh = q.shape
    quantized = kv_scales is not None
    quant2 = k_ch_scales is not None
    quant4 = quantized and not quant2 and kv_scales.shape[0] == 4
    if quant4:
        # FLAT-LANE int4 cache [L, pages, P, Nkv*Dh//2] (quant.py int4
        # section) — served by the windowed-QK path (_flat4_step)
        l, pages, p, fd = k_cache.shape
        nkv = kv_scales.shape[3]
        cdh = fd // nkv
    else:
        l, pages, p, nkv, cdh = k_cache.shape  # cdh = Dh | Dh/4 (int2)
    mp = page_table.shape[1]
    g = nq // nkv
    has_mask = select_mask is not None

    lidx = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    if page_pos is None:
        page_pos = jnp.broadcast_to(
            jnp.arange(mp, dtype=jnp.int32)[None, :], (b, mp)
        )

    # R pages per grid step (see _decode_kernel): R concurrent page DMAs
    # per step keep the HBM queues deep; the page table is padded to a
    # multiple of R with a sentinel logical page (-> pos >= ctx, masked).
    r = 4 if mp >= 4 else 1
    mp_r = -(-mp // r)
    mp_pad = mp_r * r
    if mp_pad != mp:
        page_table = jnp.pad(page_table, ((0, 0), (0, mp_pad - mp)))
        page_pos = jnp.pad(
            page_pos, ((0, 0), (0, mp_pad - mp)),
            constant_values=(1 << 30) // p,
        )

    def kv_imap_j(j):
        def imap(bb, i, lidx_ref, table_ref, ctx_ref, ppos_ref):
            return (lidx_ref[0], table_ref[bb, i * r + j], 0, 0, 0)
        return imap

    def kv_imap4_j(j):  # flat-lane 4-D int4 cache
        def imap(bb, i, lidx_ref, table_ref, ctx_ref, ppos_ref):
            return (lidx_ref[0], table_ref[bb, i * r + j], 0, 0)
        return imap

    def plane_imap(plane, j):
        # RAW [Nkv, P] scale blocks — one exact (8,128) tile per page
        # (the transposed [P, Nkv] form padded 16x in VMEM and HBM; the
        # kernel transposes in-register instead). No outside flat view:
        # with scales in the megastep scan carry, XLA would re-materialize
        # a relayout per layer.
        def imap(bb, i, lidx_ref, table_ref, ctx_ref, ppos_ref):
            return (plane, lidx_ref[0], table_ref[bb, i * r + j], 0, 0)
        return imap

    in_specs = [
        pl.BlockSpec((1, nq, dh), lambda bb, i, *_: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q]
    planes = ([0, 1, 2, 3] if quant4 else [0, 1]) if quantized else []
    if quant2:
        ngrp = k_ch_scales.shape[3]

        def ch_plane_imap(plane, j):
            def imap(bb, i, lidx_ref, table_ref, ctx_ref, ppos_ref):
                return (plane, lidx_ref[0], table_ref[bb, i * r + j],
                        0, 0, 0)
            return imap

    kv_block = (1, 1, p, nkv * cdh) if quant4 else (1, 1, p, nkv, cdh)
    for j in range(r):
        imap = kv_imap4_j(j) if quant4 else kv_imap_j(j)
        in_specs.append(pl.BlockSpec(kv_block, imap,
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(kv_block, imap,
                                     memory_space=pltpu.VMEM))
        args += [k_cache, v_cache]
        for plane in planes:
            in_specs.append(pl.BlockSpec((1, 1, 1, nkv, p),
                                         plane_imap(plane, j),
                                         memory_space=pltpu.VMEM))
            args.append(kv_scales)
        if quant2:
            for plane in (0, 1):
                in_specs.append(pl.BlockSpec((1, 1, 1, ngrp, nkv, dh),
                                             ch_plane_imap(plane, j),
                                             memory_space=pltpu.VMEM))
                args.append(k_ch_scales)
    if has_mask:
        # pre-expand the token mask to the P*Nkv key columns (token-major:
        # o*Nkv+h; repeat_interleave is free in XLA, awkward in Mosaic).
        # flat4 scores are per-TOKEN [Nq, R*P]: no Nkv expansion.
        mask_w = p if quant4 else p * nkv
        in_specs.append(
            pl.BlockSpec((1, r, 1, mask_w), lambda bb, i, *_: (bb, i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        mask_cols = select_mask.astype(jnp.int8).reshape(b, mp, 1, p)
        if not quant4:
            mask_cols = jnp.repeat(mask_cols, nkv, axis=3)
        if mp_pad != mp:
            mask_cols = jnp.pad(
                mask_cols, ((0, 0), (0, mp_pad - mp), (0, 0), (0, 0))
            )
        args.append(mask_cols)

    out_specs = pl.BlockSpec(
        (1, nq, dh), lambda bb, i, *_: (bb, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((b, nq, dh), q.dtype)
    if return_stats:
        stat_spec = pl.BlockSpec(
            (1, nq, 128), lambda bb, i, *_: (bb, 0, 0),
            memory_space=pltpu.VMEM,
        )
        stat_shape = jax.ShapeDtypeStruct((b, nq, 128), jnp.float32)
        out_specs = [out_specs, stat_spec, stat_spec]
        out_shape = [out_shape, stat_shape, stat_shape]
    if emit_raw:
        out_specs.append(pl.BlockSpec(
            (1, r, nq, p), lambda bb, i, *_: (bb, i, 0, 0),
            memory_space=pltpu.VMEM))
        out_specs.append(pl.BlockSpec(
            (1, r, nq, 128), lambda bb, i, *_: (bb, i, 0, 0),
            memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, mp_pad, nq, p),
                                              jnp.float32))
        out_shape.append(jax.ShapeDtypeStruct((b, mp_pad, nq, 128),
                                              jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, mp_r),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((nq, dh), jnp.float32),
            pltpu.VMEM((nq, 128), jnp.float32),
            pltpu.VMEM((nq, 128), jnp.float32),
        ],
    )
    kernel = _make_kernel(
        has_mask, quantized, return_stats, emit_raw, quant4=quant4,
        quant2=quant2, r=r, sm_scale=sm_scale, page_size=p, groups=g,
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * nq * mp * p * nkv * dh,
            bytes_accessed=b * nkv * mp * p * dh * 2 * k_cache.dtype.itemsize,
            transcendentals=b * nq * mp * p * nkv,
        ),
    )(lidx, page_table, ctx_lens, page_pos.astype(jnp.int32), *args)
    if emit_raw:
        out, m, l, raw, mraw = res
        raw, mraw = raw[:, :mp], mraw[:, :mp]
        m1, l1 = m[:, :, 0], l[:, :, 0]  # [B, Nq]
        # late normalization: scores[b, t] = sum_r raw * exp(m_page - m_fin)
        # / l_fin, summed over q heads (exact softmax; skipped pages carry
        # m_page = -inf -> 0)
        corr = jnp.exp(mraw[:, :, :, 0] - m1[:, None, :])  # [B, MP, Nq]
        l_safe = jnp.where(l1 <= 0.0, 1.0, l1)
        scores = jnp.einsum(
            "binp,bin->bip", raw, corr / l_safe[:, None, :]
        ).reshape(b, mp * p)
        if emit_raw_stats:
            # (out, scores, m, l): the full-layer-KIVI decode excludes the
            # current token (its scales batch-write after the layer scan)
            # and merges it outside via these stats (merge_token_attention)
            return out, scores, m1, l1
        return out, scores
    if return_stats:
        out, m, l = res
        return out, m[:, :, 0], l[:, :, 0]
    return res


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "interpret", "return_stats", "emit_raw",
                     "emit_raw_stats"),
)
def _decode_pallas_nomask(
    q, k_cache, v_cache, layer_idx, page_table, ctx_lens, page_pos=None,
    kv_scales=None, k_ch_scales=None, *, sm_scale, interpret=False,
    return_stats=False, emit_raw=False, emit_raw_stats=False,
):
    return _decode_pallas_impl(
        q, k_cache, v_cache, layer_idx, page_table, ctx_lens, None,
        page_pos, kv_scales, k_ch_scales, sm_scale=sm_scale,
        interpret=interpret, return_stats=return_stats, emit_raw=emit_raw,
        emit_raw_stats=emit_raw_stats,
    )


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "interpret", "return_stats")
)
def _decode_pallas_mask(
    q, k_cache, v_cache, layer_idx, page_table, ctx_lens, select_mask,
    page_pos=None, kv_scales=None, k_ch_scales=None, *, sm_scale,
    interpret=False, return_stats=False,
):
    return _decode_pallas_impl(
        q, k_cache, v_cache, layer_idx, page_table, ctx_lens, select_mask,
        page_pos, kv_scales, k_ch_scales, sm_scale=sm_scale,
        interpret=interpret, return_stats=return_stats,
    )


def decode_attention_pallas(
    q, k_cache, v_cache, layer_idx, page_table, ctx_lens,
    *, sm_scale, emit_scores=False, select_mask=None, page_pos=None,
    kv_scales=None, k_ch_scales=None, interpret=None, return_stats=False,
):
    """Dispatcher-facing API (matches ops.attention.decode_attention).

    Score emission runs via the XLA reference path (observation layers only).
    With ``return_stats`` returns (out, m, l) — the online-softmax running
    max and sumexp per (seq, q head) — so callers can exactly merge extra
    key/value contributions outside the kernel (int8 decode defers the
    current token this way; see models/transformer.py).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if emit_scores:
        if k_ch_scales is not None:
            raise NotImplementedError(
                "KIVI-2 caches do not serve observation layers "
                "(int2 is scoped to vanilla/streamingllm/omnikv "
                "non-obs reads)"
            )
        if select_mask is None and page_pos is None:
            # single-sweep score emission: per-page raw expsums + late
            # normalization (obs layers; replaces the ref-path gather).
            # Works for bf16 AND int8/int4 caches (in-kernel dequant) —
            # the full-layer-KIVI decode of the reference's fused
            # deltakv_kernels.py:676-1144; with return_stats the caller
            # merges the excluded current token exactly.
            return _decode_pallas_nomask(
                q, k_cache, v_cache, layer_idx, page_table, ctx_lens,
                None, kv_scales, None, sm_scale=sm_scale,
                interpret=interpret, emit_raw=True,
                emit_raw_stats=return_stats,
            )
        if page_pos is not None:
            raise NotImplementedError(
                "emit_scores with a compacted table (page_pos) has no "
                "ref fallback — obs layers always read the dense table"
            )
        assert not return_stats

        def _layer(c):
            return jax.lax.dynamic_index_in_dim(c, layer_idx, 0,
                                                keepdims=False)
        lsc = None if kv_scales is None else kv_scales[:, layer_idx]
        return ref.decode_attention_ref(
            q, _layer(k_cache), _layer(v_cache), page_table, ctx_lens,
            sm_scale=sm_scale, emit_scores=True, select_mask=select_mask,
            kv_scales=lsc,
        )
    if select_mask is not None:
        # page_pos threads through: the OmniKV compacted path passes a
        # permuted table + mask + logical page positions together
        res = _decode_pallas_mask(
            q, k_cache, v_cache, layer_idx, page_table, ctx_lens,
            select_mask, page_pos, kv_scales, k_ch_scales,
            sm_scale=sm_scale, interpret=interpret,
            return_stats=return_stats,
        )
    else:
        res = _decode_pallas_nomask(
            q, k_cache, v_cache, layer_idx, page_table, ctx_lens, page_pos,
            kv_scales, k_ch_scales, sm_scale=sm_scale, interpret=interpret,
            return_stats=return_stats,
        )
    if return_stats:
        return res  # (out, m, l)
    return res, None


# ---------------------------------------------------------------------------
# Observation-layer score pass (OmniKV/DeltaKV full layers): head-summed
# softmax token probabilities, computed in a second K-only sweep using the
# final online-softmax stats (m, l) from the main kernel. Replaces the XLA
# ref-path gather (which materializes [B, Nq, K, Dh] and dominated OmniKV
# decode: 31 tok/s obs-bound vs 40 tok/s fully dense at 64K bs1).
# ---------------------------------------------------------------------------


def _score_kernel(
    lidx_ref, table_ref, ctx_ref, ppos_ref,  # scalar prefetch
    q_ref,  # [1, Nq, Dh]
    k_ref,  # [1, 1, P, Nkv, Dh]
    m_ref,  # [1, Nq, 128] final running max (lane-replicated)
    l_ref,  # [1, Nq, 128] final sumexp
    out_ref,  # [1, 1, 8, P] f32; row 0 = head-summed token probabilities
    *,
    sm_scale: float,
    page_size: int,
    groups: int,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    ctx = ctx_ref[b]
    logical_page = ppos_ref[b, i]

    out_ref[0, 0] = jnp.zeros_like(out_ref[0, 0])

    @pl.when(logical_page * page_size < ctx)
    def _compute():
        q = q_ref[0].astype(jnp.float32)  # [Nq, Dh]
        nkv = k_ref.shape[3]
        k = k_ref[0, 0].astype(jnp.float32).reshape(page_size * nkv, -1)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # [Nq, P*Nkv]
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        pos = logical_page * page_size + col // nkv
        valid = (row // groups == col % nkv) & (pos < ctx)
        m = m_ref[0, :, :1]  # [Nq, 1]
        l = l_ref[0, :, :1]
        l_safe = jnp.where(l <= 0.0, 1.0, l)
        probs = jnp.where(valid, jnp.exp(s - m), 0.0) / l_safe
        # fold [Nq, P*Nkv] -> token sums [Nq, P] with a 0/1 matmul (Mosaic
        # cannot reshape lanes into sublanes), then reduce over q heads.
        er = jax.lax.broadcasted_iota(jnp.int32, (page_size * nkv,
                                                  page_size), 0)
        ec = jax.lax.broadcasted_iota(jnp.int32, (page_size * nkv,
                                                  page_size), 1)
        fold = (er // nkv == ec).astype(jnp.float32)
        tok = jax.lax.dot_general(
            probs, fold, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Nq, P]
        tok_sum = jnp.sum(tok, axis=0, keepdims=True)  # [1, P]
        out_ref[0, 0] = jnp.broadcast_to(
            tok_sum, out_ref.shape[2:]
        ) * (jax.lax.broadcasted_iota(
            jnp.int32, out_ref.shape[2:], 0) == 0)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def decode_scores_pallas(
    q, k_cache, layer_idx, page_table, ctx_lens, m, l,
    *, sm_scale, interpret=False,
):
    """Head-summed softmax token scores [B, MP*P] fp32 (K-only sweep).

    ``m``/``l`` are the final online-softmax stats from the main decode
    kernel (return_stats). Semantics match decode_attention_ref's
    emit_scores output.
    """
    b, nq, dh = q.shape
    lnum, pages, p, nkv, _ = k_cache.shape
    mp = page_table.shape[1]
    g = nq // nkv
    lidx = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    ppos = jnp.broadcast_to(jnp.arange(mp, dtype=jnp.int32)[None, :],
                            (b, mp))

    def kv_imap(bb, i, lidx_ref, table_ref, ctx_ref, ppos_ref):
        return (lidx_ref[0], table_ref[bb, i], 0, 0, 0)

    m3 = jnp.broadcast_to(m[:, :, None], (b, nq, 128)).astype(jnp.float32)
    l3 = jnp.broadcast_to(l[:, :, None], (b, nq, 128)).astype(jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, mp),
        in_specs=[
            pl.BlockSpec((1, nq, dh), lambda bb, i, *_: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p, nkv, dh), kv_imap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, 128), lambda bb, i, *_: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, 128), lambda bb, i, *_: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 8, p), lambda bb, i, *_: (bb, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[],
    )
    raw = pl.pallas_call(
        functools.partial(_score_kernel, sm_scale=sm_scale, page_size=p,
                          groups=g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, mp, 8, p), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nq * mp * p * nkv * dh,
            bytes_accessed=b * nkv * mp * p * dh * k_cache.dtype.itemsize,
            transcendentals=b * nq * mp * p * nkv,
        ),
    )(lidx, page_table, ctx_lens, ppos, q, k_cache, m3, l3)
    return raw[:, :, 0, :].reshape(b, mp * p)
