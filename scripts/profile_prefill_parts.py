"""Isolate prefill cost on chip: store-scatter vs pallas attention vs MLP.

Times three jitted loops at 3B-like shapes (L layers scanned, one 8K chunk):
  store:  per-layer KV store scatter only
  attn:   per-layer pallas prefill attention only (cache constant)
  full:   store + attention (no MLP)
A full-cache-copy pathology shows up as store >> expected (~GB/s scaling).
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from sparsevllm_tpu.ops import attention as attn_ops  # noqa: E402


def timeit(fn, *args, n=3, thread=False):
    """thread=True: outputs feed the next call (donated-buffer loops)."""
    out = fn(*args)
    if thread:
        args = out[: len(args)]
    leaf = jax.tree_util.tree_leaves(out)[-1]
    _ = float(jnp.sum(leaf.ravel()[:1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        if thread:
            args = out[: len(args)]
    leaf = jax.tree_util.tree_leaves(out)[-1]
    # device->host fetch of one f32 element forces a real sync
    _ = float(jnp.sum(leaf.ravel()[:1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--nkv", type=int, default=8)
    ap.add_argument("--nq", type=int, default=24)
    ap.add_argument("--dh", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--page", type=int, default=64)
    ap.add_argument("--pages", type=int, default=520)
    ap.add_argument("--mp", type=int, default=256)
    args = ap.parse_args()
    L, nkv, nq, dh, p = (args.layers, args.nkv, args.nq, args.dh, args.page)
    s, pages, mp = args.chunk, args.pages, args.mp

    rng = np.random.default_rng(0)
    kc = jnp.zeros((L, pages, p, nkv, dh), jnp.bfloat16)
    vc = jnp.zeros_like(kc)
    k_new = jnp.asarray(rng.normal(size=(1, s, nkv, dh)), jnp.bfloat16)
    v_new = jnp.asarray(rng.normal(size=(1, s, nkv, dh)), jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(1, s, nq, dh)), jnp.bfloat16)
    dest = jnp.arange(s, dtype=jnp.int32)[None]  # slots 0..s-1
    table = jnp.arange(mp, dtype=jnp.int32)[None]
    ctx = jnp.asarray([s], jnp.int32)
    new = jnp.asarray([s], jnp.int32)

    @jax.jit
    def store_only(kc, vc):
        def body(carry, li):
            kc, vc = carry
            kc, vc = attn_ops.store_kv_layer(kc, vc, li, k_new, v_new, dest)
            return (kc, vc), None
        (kc, vc), _ = jax.lax.scan(
            body, (kc, vc), jnp.arange(L, dtype=jnp.int32))
        return kc, vc

    @jax.jit
    def attn_only(kc, vc):
        def body(acc, li):
            out, _ = attn_ops.prefill_attention(
                q, kc, vc, li, table, ctx, new,
                sm_scale=dh ** -0.5, impl="pallas")
            return acc + out.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(L, dtype=jnp.int32))
        return acc

    @jax.jit
    def full(kc, vc):
        def body(carry, li):
            kc, vc, acc = carry
            kc, vc = attn_ops.store_kv_layer(kc, vc, li, k_new, v_new, dest)
            out, _ = attn_ops.prefill_attention(
                q, kc, vc, li, table, ctx, new,
                sm_scale=dh ** -0.5, impl="pallas")
            return (kc, vc, acc + out.astype(jnp.float32).sum()), None
        (kc, vc, acc), _ = jax.lax.scan(
            body, (kc, vc, jnp.float32(0)), jnp.arange(L, dtype=jnp.int32))
        return kc, vc, acc

    cache_gib = kc.nbytes * 2 / 2**30
    print(f"L={L} chunk={s} pages={pages} cache={cache_gib:.2f} GiB")
    # store_only donates nothing here (kc passed by value) — measure both
    dt = timeit(store_only, kc, vc)
    print(f"store (scan {L} layers, no donation): {dt * 1e3:8.1f} ms")
    dt = timeit(attn_only, kc, vc)
    print(f"attn  (pallas, {mp} pages/ctx):       {dt * 1e3:8.1f} ms")
    st_d = jax.jit(store_only.__wrapped__, donate_argnums=(0, 1))
    dt = timeit(st_d, kc + 0, vc + 0, thread=True)
    print(f"store (donated):                      {dt * 1e3:8.1f} ms")
    fl_d = jax.jit(full.__wrapped__, donate_argnums=(0, 1))
    dt = timeit(fl_d, kc + 0, vc + 0, thread=True)
    print(f"full  (store+attn, donated):          {dt * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
