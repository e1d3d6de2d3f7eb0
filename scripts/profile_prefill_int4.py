"""Profile prefill attention per layer at long context: bf16 vs int8 vs int4.

Bench observed ~60 s per 8K chunk at 128K-ctx int4 prefill (28 layers ->
~2.1 s/layer) where the bf16 roofline says ~10 ms. Hypothesis: per-S-block
context re-streaming multiplies the in-kernel dequant (and DMA) by
S/block_s. This isolates one layer's prefill_attention at a mid-prefill
shape to locate the time.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from sparsevllm_tpu.ops import attention as attn_ops  # noqa: E402


def run_case(ctx, chunk, dtype, nkv=8, nq=24, dh=128, p=128, iters=8):
    rng = np.random.default_rng(0)
    pages = ctx // p + 2
    mp = pages
    if dtype == "int4":
        kc = jnp.asarray(rng.integers(0, 255, (1, pages, p, nkv * (dh // 2))),
                         jnp.uint8).view(jnp.int8)
        vc = jnp.asarray(rng.integers(0, 255, (1, pages, p, nkv * (dh // 2))),
                         jnp.uint8).view(jnp.int8)
        scales = jnp.asarray(
            rng.uniform(0.01, 0.02, (4, 1, pages, nkv, p)), jnp.float32)
    elif dtype == "int8":
        kc = jnp.asarray(rng.integers(-127, 128, (1, pages, p, nkv, dh)),
                         jnp.int8)
        vc = jnp.asarray(rng.integers(-127, 128, (1, pages, p, nkv, dh)),
                         jnp.int8)
        scales = jnp.asarray(
            rng.uniform(0.01, 0.02, (2, 1, pages, nkv, p)), jnp.float32)
    else:
        kc = jnp.asarray(rng.standard_normal((1, pages, p, nkv, dh)),
                         jnp.bfloat16)
        vc = jnp.asarray(rng.standard_normal((1, pages, p, nkv, dh)),
                         jnp.bfloat16)
        scales = None
    q = jnp.asarray(rng.standard_normal((1, chunk, nq, dh)), jnp.bfloat16)
    table = jnp.arange(mp, dtype=jnp.int32)[None]
    ctx_l = jnp.asarray([ctx], jnp.int32)
    new_l = jnp.asarray([chunk], jnp.int32)

    def run(qq, kc, vc, scales):
        out, _ = attn_ops.prefill_attention(
            qq, kc, vc, 0, table, ctx_l, new_l,
            sm_scale=dh ** -0.5, impl="pallas", kv_scales=scales)
        return out

    @jax.jit
    def chain(qq, n, kc, vc, scales):
        return jax.lax.fori_loop(
            0, n, lambda _, o: run(o.astype(q.dtype), kc, vc, scales), qq)

    def timed(n):
        t0 = time.perf_counter()
        float(chain(q, n, kc, vc, scales)[0, 0, 0, 0])
        return time.perf_counter() - t0

    timed(1)
    n1, n2 = 2, 2 + iters
    ests = []
    for _ in range(3):
        t1, t2 = timed(n1), timed(n2)
        ests.append((t2 - t1) / (n2 - n1))
    dt = sorted(ests)[1]
    kv_bytes = 2 * pages * p * nkv * kc.shape[-1] * 1
    if dtype == "bfloat16":
        kv_bytes *= 2
    print(f"ctx={ctx} chunk={chunk} {dtype}: {dt * 1e3:8.1f} ms/layer "
          f"(ctx KV {kv_bytes / 1e6:.0f} MB)")
    return dt


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}")
    for dtype in ("bfloat16", "int8", "int4"):
        run_case(65536, 8192, dtype)
