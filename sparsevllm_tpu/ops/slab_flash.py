"""Slab-combine flash attention for the staged long-prefill path (TPU).

Round-3's staged prefill ran the long-context attention as an XLA
(layer -> kv-block -> q-tile) online-softmax scan and measured ~6.5-9% MFU
(PERF_NOTES.md "Staged prefill"): every q-tile re-materialized f32 score
transients and re-dequantized the int4 staging pool, and the
dynamic_update_slice accumulator carries defeated XLA's fusion.

This module re-expresses the same math as a scan over context SLABS:

  * each past slab (one chunk-sized run of staging pages) is gather-
    dequantized from the int4/int8 staging pool into a bounded bf16
    scratch ONCE per (layer, chunk) — the dequant amplification drops
    from O(q_tiles) to O(1);
  * a dense flash kernel (jax's bundled pallas TPU flash_attention,
    measured 68% MFU at [24576 x 8192 x 128] on v5e) computes the slab's
    (out, sumexp, max) with GQA folded into the query rows (a kv head's
    g query heads stack as extra query rows — exact for non-causal
    slabs);
  * slabs combine by the standard logsumexp merge;
  * the current chunk itself is the final causal slab over its exact
    bf16 K/V (no staging round-trip), computed with per-head layout so
    the kernel's causal mask applies directly.

Reference counterpart: triton_kernel/context_flashattention_nopad.py (the
bf16 prefill speed bar) + the staged-pool design in engine/executor.py.
The bundled kernel is used rather than ops/prefill_attention.py because
the staging pool of the single in-flight sequence is CONTIGUOUS in logical
order (pages_row is an arange into the pool), so paged gather-DMA
machinery adds nothing, and the dense kernel's measured MFU is ~2x the
paged kernel's.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas.ops.tpu import flash_attention as _fa

NEG_INF = -1e30


def _block(n: int, cap: int = 1024) -> int:
    b = min(cap, n)
    while n % b:
        b //= 2
    return max(b, 1)


def _flash_residuals(q, k, v, *, causal: bool, sm_scale: float):
    """(o, l, m) from the bundled TPU flash kernel.

    q [1, H, Sq, D]; k/v [1, H, Skv, D]. o is softmax-normalized; l is the
    per-row sumexp, m the per-row max (both f32 [1, H, Sq])."""
    bq = _block(q.shape[2])
    bk = _block(k.shape[2])
    return _fa._flash_attention_impl(
        q, k, v, None, None, True, causal, sm_scale,
        1, bq, bk, bk, False,
    )


def _combine(carry, o, l, m):
    """Merge one slab's normalized (o, l, m) into the running
    unnormalized accumulator. carry = (acc f32 [..., D], m_run, l_run)."""
    acc, m_run, l_run = carry
    m_new = jnp.maximum(m_run, m)
    a = jnp.exp(m_run - m_new)
    b = jnp.exp(m - m_new)
    acc = acc * a[..., None] + o.astype(jnp.float32) * (l * b)[..., None]
    l_new = l_run * a + l * b
    return acc, m_new, l_new


def staged_slab_attention(
    q,  # [sb, Nq, Dh] post-RoPE queries (model dtype)
    kr,  # [sb, Nkv, Dh] current chunk exact K (post-RoPE)
    vr,  # [sb, Nkv, Dh]
    dequant_slab,  # fn(bi) -> (k_slab [Nkv, sb, Dh], v_slab) model dtype
    start,  # scalar int32: resident slot start of this chunk
    *,
    nblk: int,  # static slab count (bucket pages * P // sb)
    sb: int,
    nkv: int,
    groups: int,
    sm_scale: float,
):
    """Full staged-context attention for one layer -> [sb, Nq, Dh]."""
    dh = q.shape[-1]
    sbg = sb * groups
    fdt = q.dtype

    # fold GQA into query rows: row h*sbg' ordering [nkv, sb*g]
    qf = (
        q.reshape(sb, nkv, groups, dh)
        .transpose(1, 0, 2, 3)
        .reshape(1, nkv, sbg, dh)
    )

    acc0 = jnp.zeros((1, nkv, sbg, dh), jnp.float32)
    m0 = jnp.full((1, nkv, sbg), NEG_INF, jnp.float32)
    l0 = jnp.zeros((1, nkv, sbg), jnp.float32)

    def slab(carry, bi):
        def live(c):
            k_s, v_s = dequant_slab(bi)
            o, l, m = _flash_residuals(
                qf, k_s[None], v_s[None], causal=False, sm_scale=sm_scale
            )
            return _combine(c, o, l, m)

        return jax.lax.cond(bi * sb < start, live, lambda c: c, carry), None

    carry = (acc0, m0, l0)
    if nblk > 0:
        carry, _ = jax.lax.scan(
            slab, carry, jnp.arange(nblk, dtype=jnp.int32)
        )

    # boundary: the chunk itself, causal, per-head layout (kv heads
    # repeated to Nq so row index == token index for the causal mask)
    qh = q.reshape(1, sb, nkv * groups, dh).transpose(0, 2, 1, 3)
    kh = jnp.repeat(kr.transpose(1, 0, 2), groups, axis=0)[None]
    vh = jnp.repeat(vr.transpose(1, 0, 2), groups, axis=0)[None]
    o_b, l_b, m_b = _flash_residuals(
        qh, kh.astype(fdt), vh.astype(fdt), causal=True, sm_scale=sm_scale
    )

    def fold(x):  # [1, Nq, sb, ...] -> [1, nkv, sb*g, ...]
        tail = x.shape[3:]
        return (
            x.reshape(nkv, groups, sb, *tail)
            .transpose(0, 2, 1, *(3 + i for i in range(len(tail))))
            .reshape(1, nkv, sbg, *tail)
        )

    acc, m_run, l_run = _combine(carry, fold(o_b), fold(l_b), fold(m_b))
    l_safe = jnp.where(l_run <= 0.0, 1.0, l_run)
    out = (acc / l_safe[..., None]).astype(fdt)
    return (
        out.reshape(nkv, sb, groups, dh)
        .transpose(1, 0, 2, 3)
        .reshape(sb, nkv * groups, dh)
    )
