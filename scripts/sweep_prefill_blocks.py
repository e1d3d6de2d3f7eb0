"""Sweep prefill kernel block_s x block_pages on chip (bf16 + int4).

The prefill kernel's cost = ctx-DMA * (S/block_s) + state-update traffic
* (ctx/(KP*P)) * (S/block_s) + dequant * same. Larger blocks amortize
both; VMEM caps them. Finds the per-dtype sweet spot.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from sparsevllm_tpu.ops import prefill_attention as pf  # noqa: E402


def run_case(ctx, chunk, dtype, block_s, kp, nkv=8, nq=24, dh=128, p=128,
             iters=6):
    rng = np.random.default_rng(0)
    pages = ctx // p + 2
    if dtype == "int4":
        kc = jnp.asarray(rng.integers(0, 255, (1, pages, p, nkv * (dh // 2))),
                         jnp.uint8).view(jnp.int8)
        vc = jnp.asarray(rng.integers(0, 255, (1, pages, p, nkv * (dh // 2))),
                         jnp.uint8).view(jnp.int8)
        scales = jnp.asarray(
            rng.uniform(0.01, 0.02, (4, 1, pages, nkv, p)), jnp.float32)
    else:
        kc = jnp.asarray(rng.standard_normal((1, pages, p, nkv, dh)),
                         jnp.bfloat16)
        vc = jnp.asarray(rng.standard_normal((1, pages, p, nkv, dh)),
                         jnp.bfloat16)
        scales = None
    q = jnp.asarray(rng.standard_normal((1, chunk, nq, dh)), jnp.bfloat16)
    table = jnp.arange(pages, dtype=jnp.int32)[None]
    ctx_l = jnp.asarray([ctx], jnp.int32)
    new_l = jnp.asarray([chunk], jnp.int32)

    def run(qq, kc, vc, scales):
        return pf._prefill_pallas(
            qq, kc, vc, 0, table, ctx_l, new_l, scales,
            sm_scale=dh ** -0.5, block_s=block_s, block_pages=kp)

    @jax.jit
    def chain(qq, n, kc, vc, scales):
        return jax.lax.fori_loop(
            0, n, lambda _, o: run(o.astype(q.dtype), kc, vc, scales), qq)

    def timed(n):
        t0 = time.perf_counter()
        float(chain(q, n, kc, vc, scales)[0, 0, 0, 0])
        return time.perf_counter() - t0

    try:
        timed(1)
    except Exception as e:  # noqa: BLE001
        print(f"{dtype} bs={block_s} kp={kp}: FAIL "
              f"{str(e).splitlines()[0][:90]}")
        return None
    n1, n2 = 1, 1 + iters
    ests = []
    for _ in range(3):
        t1, t2 = timed(n1), timed(n2)
        ests.append((t2 - t1) / (n2 - n1))
    dt = sorted(ests)[1]
    print(f"{dtype} bs={block_s} kp={kp}: {dt * 1e3:8.1f} ms/layer")
    return dt


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}")
    ctx, chunk = 65536, 8192
    for dtype in ("bfloat16", "int4"):
        for block_s in (256, 512):
            for kp in (4, 8, 16):
                run_case(ctx, chunk, dtype, block_s, kp)
