"""On-chip probe for the slab-based staged prefill redesign (round 4).

Design under test: per (layer, chunk), attention over the long int4-staged
context runs as a scan over SLABS — each slab is gather-dequantized ONCE
into a bounded bf16 scratch (killing the per-q-block re-dequant
amplification of both the in-kernel int4 path and the XLA block-scan), then
a dense flash kernel (jax's bundled pallas TPU flash_attention) computes
(out_i, lse_i) and the slabs combine by logsumexp. The current chunk is the
final (causal) slab using exact bf16 K/V.

This script times the pieces at production shapes so the design can be
validated before it is wired into the executor:
  A. folded-GQA non-causal flash over one slab (past slabs)
  B. causal flash over the chunk itself (boundary slab)
  C. slab gather-dequant (int4 flat-lane -> bf16 scratch)
  D. lse combine arithmetic

MFU numbers assume v5e bf16 peak 197 TFLOP/s.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from jax.experimental.pallas.ops.tpu import flash_attention as fa  # noqa: E402

from sparsevllm_tpu.ops import quant as quant_ops  # noqa: E402

PEAK = 197e12  # v5e bf16


def timed_chain(fn, seed_arrays, iters=8):
    """On-device chained timing (block_until_ready unreliable over axon):
    fn(*seed) -> array fed back; difference two iteration counts."""

    @jax.jit
    def chain(x, n):
        def body(_, o):
            return fn(o)
        return jax.lax.fori_loop(0, n, body, x)

    def run(n):
        t0 = time.perf_counter()
        out = chain(seed_arrays, n)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        return time.perf_counter() - t0

    run(1)
    n1, n2 = iters, iters * 4
    ests = []
    for _ in range(3):
        ests.append((run(n2) - run(n1)) / (n2 - n1))
    return sorted(ests)[1]


def bench_flash_noncausal(sq, skv, nkv, g, dh, bq, bkm, bk):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, nkv, sq * g, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, nkv, skv, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, nkv, skv, dh)), jnp.bfloat16)

    def fn(qq):
        o, l, m = fa._flash_attention_impl(
            qq, k, v, None, None, True, False, dh ** -0.5,
            1, bq, bkm, bk, False,
        )
        return o.astype(jnp.bfloat16)

    dt = timed_chain(fn, q)
    flops = 4 * nkv * (sq * g) * skv * dh
    print(f"A noncausal folded sq={sq} g={g} skv={skv} bq={bq} bkm={bkm}: "
          f"{dt*1e3:.2f} ms  {flops/dt/1e12:.1f} TF/s "
          f"({100*flops/dt/PEAK:.0f}% MFU)")
    return dt


def bench_flash_causal(s, nq, dh, bq, bkm, bk):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, nq, s, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, nq, s, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, nq, s, dh)), jnp.bfloat16)

    def fn(qq):
        o, l, m = fa._flash_attention_impl(
            qq, k, v, None, None, True, True, dh ** -0.5,
            1, bq, bkm, bk, False,
        )
        return o.astype(jnp.bfloat16)

    dt = timed_chain(fn, q)
    flops = 4 * nq * s * s * dh / 2  # causal half
    print(f"B causal s={s} nq={nq} bq={bq} bkm={bkm}: "
          f"{dt*1e3:.2f} ms  {flops/dt/1e12:.1f} TF/s "
          f"({100*flops/dt/PEAK:.0f}% MFU eff)")
    return dt


def bench_dequant(slab, p, nkv, dh):
    rng = np.random.default_rng(0)
    pages = slab // p
    npool = pages + 8
    kc = jnp.asarray(
        rng.integers(0, 255, (npool, p, nkv * dh // 2)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.02, (npool, nkv, p)), jnp.float32)
    kz = jnp.asarray(rng.uniform(-1, 0, (npool, nkv, p)), jnp.float32)
    idx = jnp.arange(pages, dtype=jnp.int32)

    seed = jnp.zeros((), jnp.bfloat16)

    @jax.jit
    def chain(x, n):
        def body(_, o):
            out = quant_ops.gather_dequant_pages_u4(
                kc, ks, kz, idx + (o > 1e9).astype(jnp.int32), nkv)
            return out[0, 0, 0, 0].astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, n, body, x)

    def run(n):
        t0 = time.perf_counter()
        _ = float(chain(seed, n).ravel()[0])
        return time.perf_counter() - t0

    run(1)
    ests = []
    for _ in range(3):
        ests.append((run(32) - run(8)) / 24)
    dt = sorted(ests)[1]
    by = slab * nkv * dh // 2 + 2 * pages * nkv * p * 4
    print(f"C dequant slab={slab}: {dt*1e3:.3f} ms "
          f"({by/dt/1e9:.0f} GB/s read eq)")
    return dt


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}")
    nkv, g, dh, nq = 8, 3, 128, 24
    chunk = 8192
    # A: past-slab flash, folded GQA (q rows = chunk*g per kv head)
    for bq, bkm in [(512, 512), (512, 1024), (1024, 512), (1024, 1024),
                    (2048, 1024)]:
        try:
            bench_flash_noncausal(chunk, chunk, nkv, g, dh, bq, bkm, bkm)
        except Exception as e:  # noqa: BLE001
            print(f"A bq={bq} bkm={bkm} failed: {type(e).__name__}")
    # B: boundary causal flash (heads repeated to nq)
    for bq, bkm in [(512, 512), (1024, 1024)]:
        try:
            bench_flash_causal(chunk, nq, dh, bq, bkm, bkm)
        except Exception as e:  # noqa: BLE001
            print(f"B bq={bq} bkm={bkm} failed: {type(e).__name__}")
    # C: slab dequant
    bench_dequant(chunk, 128, nkv, dh)
