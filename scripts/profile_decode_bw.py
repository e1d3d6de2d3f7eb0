"""Decode-kernel HBM bandwidth vs roofline (run on chip).

Decode attention is bandwidth-bound: every step must stream the full kept
KV working set (B * MP * P * Nkv * Dh * 2 planes) from HBM once. This
script times the kernel alone at production-like shapes and reports
achieved GB/s against the chip's HBM peak (v5e: ~819 GB/s), tracking
VERDICT round-1 item 4 (>=80% of roofline at bs=8, P=128).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from sparsevllm_tpu.ops import paged_decode as pd  # noqa: E402

HBM_PEAK_GBS = 819.0  # TPU v5e


def bench(B, MP, P, Nkv, Nq, Dh, dtype, quant=None, iters=50):
    rng = np.random.default_rng(0)
    L, pages = 1, B * MP + 8
    if quant:
        kc = jnp.asarray(rng.integers(-8, 8, (L, pages, P, Nkv, Dh)),
                         jnp.int8)
        vc = jnp.asarray(rng.integers(-8, 8, (L, pages, P, Nkv, Dh)),
                         jnp.int8)
        scales = jnp.asarray(
            rng.uniform(0.01, 0.02, (2, L, pages, Nkv, P)), jnp.float32)
        kv_bytes = 1
    else:
        kc = jnp.asarray(rng.standard_normal((L, pages, P, Nkv, Dh)), dtype)
        vc = jnp.asarray(rng.standard_normal((L, pages, P, Nkv, Dh)), dtype)
        scales = None
        kv_bytes = np.dtype(dtype).itemsize
    q = jnp.asarray(rng.standard_normal((B, Nq, Dh)), dtype)
    table = jnp.arange(B * MP, dtype=jnp.int32).reshape(B, MP)
    ctx = jnp.full((B,), MP * P, jnp.int32)

    def run(qq, kc, vc, scales):
        out, _ = pd.decode_attention_pallas(
            qq, kc, vc, 0, table, ctx, sm_scale=Dh ** -0.5,
            kv_scales=scales, interpret=False)
        return out

    # Axon-tunnel-safe timing: block_until_ready returns before real
    # execution completes over the tunnel and per-call dispatch costs an
    # RPC, so run the whole chain ON-DEVICE (fori_loop, out -> q chained
    # to serialize), end with a forced scalar D2H fetch, and difference
    # two iteration counts to cancel the fixed round-trip overhead.
    @jax.jit
    def chain(qq, n, kc, vc, scales):
        return jax.lax.fori_loop(
            0, n, lambda _, o: run(o.astype(q.dtype), kc, vc, scales), qq)

    def timed(n):
        t0 = time.perf_counter()
        float(chain(q, n, kc, vc, scales)[0, 0, 0])
        return time.perf_counter() - t0

    timed(2)  # warm compile + path
    n1, n2 = iters, iters * 5
    ests = []
    for _ in range(3):
        t1, t2 = timed(n1), timed(n2)
        ests.append((t2 - t1) / (n2 - n1))
    dt = sorted(ests)[1]
    bytes_moved = B * MP * P * Nkv * Dh * 2 * kv_bytes
    if quant:
        bytes_moved += 2 * B * MP * P * Nkv * 4  # scale planes
    gbs = bytes_moved / dt / 1e9
    name = "int8" if quant else np.dtype(dtype).name
    print(f"B{B} MP{MP} P{P} Nkv{Nkv} Nq{Nq} {name}: "
          f"{dt * 1e3:.3f} ms  {gbs:.0f} GB/s  "
          f"{100 * gbs / HBM_PEAK_GBS:.0f}% of peak")
    return gbs


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} device={jax.devices()[0]}")
    # production decode: 3B-class, bs=8, kept working set 4608 tok (MP=36)
    bench(8, 36, 128, 8, 24, 128, jnp.bfloat16)
    # long-context: bs=1, 64K ctx
    bench(1, 512, 128, 8, 24, 128, jnp.bfloat16)
    # mid: bs=4, 16K each
    bench(4, 128, 128, 8, 24, 128, jnp.bfloat16)
    # int8 variant at the headline shape
    bench(8, 36, 128, 8, 24, 128, jnp.bfloat16, quant=True)
