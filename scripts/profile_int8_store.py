"""Isolate int8 decode-store cost on chip: payload scatter vs scale DUS loop
vs fused-dequant attention kernel, at decode shapes (B tokens/step, L-layer
scan), next to the bf16 equivalents.
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
from sparsevllm_tpu.ops import quant as quant_ops  # noqa: E402


def timeit(fn, *args, n=5, thread=0):
    out = fn(*args)
    if thread:
        args = tuple(out[:thread]) + args[thread:]
    leaf = jax.tree_util.tree_leaves(out)[-1]
    _ = float(jnp.sum(leaf.ravel()[:1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        if thread:
            args = tuple(out[:thread]) + args[thread:]
    leaf = jax.tree_util.tree_leaves(out)[-1]
    _ = float(jnp.sum(leaf.ravel()[:1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--nkv", type=int, default=8)
    ap.add_argument("--nq", type=int, default=24)
    ap.add_argument("--dh", type=int, default=128)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--page", type=int, default=64)
    ap.add_argument("--pages", type=int, default=640)
    ap.add_argument("--mp", type=int, default=76)
    args = ap.parse_args()
    L, nkv, nq, dh = args.layers, args.nkv, args.nq, args.dh
    b, p, pages, mp = args.b, args.page, args.pages, args.mp

    rng = np.random.default_rng(0)
    kc8 = jnp.zeros((L, pages, p, nkv, dh), jnp.int8)
    vc8 = jnp.zeros_like(kc8)
    kcb = jnp.zeros((L, pages, p, nkv, dh), jnp.bfloat16)
    vcb = jnp.zeros_like(kcb)
    scales = jnp.ones((2, L, pages, p, nkv), jnp.float32)
    k_new = jnp.asarray(rng.normal(size=(b, nkv, dh)), jnp.bfloat16)
    v_new = jnp.asarray(rng.normal(size=(b, nkv, dh)), jnp.bfloat16)
    dest = jnp.arange(b, dtype=jnp.int32) * p + 3
    q = jnp.asarray(rng.normal(size=(b, nq, dh)), jnp.bfloat16)
    table = jnp.broadcast_to(jnp.arange(mp, dtype=jnp.int32)[None], (b, mp))
    ctx = jnp.full((b,), mp * p - 5, jnp.int32)

    def scan_l(body, carry):
        return jax.lax.scan(body, carry, jnp.arange(L, dtype=jnp.int32))[0]

    @jax.jit
    def bf16_store(kc, vc):
        return scan_l(
            lambda c, li: (attn_ops.store_kv_layer(
                c[0], c[1], li, k_new, v_new, dest), None)[0], (kc, vc))

    @jax.jit
    def int8_store_full(kc, vc, sc):
        def body(c, li):
            kc, vc, sc = c
            kc, vc, sc = quant_ops.store_kv_quant_decode(
                kc, vc, sc, li, k_new, v_new, dest)
            return (kc, vc, sc), None
        return scan_l(body, (kc, vc, sc))

    @jax.jit
    def int8_payload_only(kc, vc):
        def body(c, li):
            kc, vc = c
            kq, _ = quant_ops.quantize_rows(k_new)
            vq, _ = quant_ops.quantize_rows(v_new)
            lix = jnp.broadcast_to(li, dest.shape)
            page = dest // p
            off = dest % p
            kc = kc.at[lix, page, off].set(kq, mode="drop")
            vc = vc.at[lix, page, off].set(vq, mode="drop")
            return (kc, vc), None
        return scan_l(body, (kc, vc))

    @jax.jit
    def scales_only(sc):
        def body(sc, li):
            _, ks = quant_ops.quantize_rows(k_new)
            _, vs = quant_ops.quantize_rows(v_new)

            def tok(t, s2):
                d = dest[t]
                return jax.lax.dynamic_update_slice(
                    s2, jnp.stack([ks[t], vs[t]])[:, None, None, None, :],
                    (0, li, d // p, d % p, 0))
            return jax.lax.fori_loop(0, b, tok, sc), None
        return scan_l(body, sc)

    @jax.jit
    def attn8(kc, vc, sc):
        def body(acc, li):
            out, _ = attn_ops.decode_attention(
                q, kc, vc, li, table, ctx, sm_scale=dh ** -0.5,
                kv_scales=sc, impl="pallas")
            return acc + out.astype(jnp.float32).sum(), None
        return scan_l(body, jnp.float32(0))

    @jax.jit
    def attnb(kc, vc):
        def body(acc, li):
            out, _ = attn_ops.decode_attention(
                q, kc, vc, li, table, ctx, sm_scale=dh ** -0.5,
                impl="pallas")
            return acc + out.astype(jnp.float32).sum(), None
        return scan_l(body, jnp.float32(0))

    print(f"L={L} B={b} P={p} pages={pages} mp={mp}")
    d = jax.jit(bf16_store.__wrapped__, donate_argnums=(0, 1))
    print(f"bf16 store:          {timeit(d, kcb + 0, vcb + 0, thread=2) * 1e3:7.1f} ms")
    d = jax.jit(int8_payload_only.__wrapped__, donate_argnums=(0, 1))
    print(f"int8 payload store:  {timeit(d, kc8 + 0, vc8 + 0, thread=2) * 1e3:7.1f} ms")
    d = jax.jit(scales_only.__wrapped__, donate_argnums=(0,))
    print(f"scale DUS loop:      {timeit(d, scales + 0, thread=1) * 1e3:7.1f} ms")
    d = jax.jit(int8_store_full.__wrapped__, donate_argnums=(0, 1, 2))
    print(f"int8 store full:     {timeit(d, kc8 + 0, vc8 + 0, scales + 0, thread=3) * 1e3:7.1f} ms")
    print(f"bf16 attn:           {timeit(attnb, kcb, vcb) * 1e3:7.1f} ms")
    print(f"int8 attn (dequant): {timeit(attn8, kc8, vc8, scales) * 1e3:7.1f} ms")


if __name__ == "__main__":
    main()
