"""Isolate int8 decode-store cost on chip (HISTORICAL probe).

This script diagnosed the int8 scale-store pathology (see PERF_NOTES.md
issue 1, commit eed8da7): its store_kv_quant_decode variants reproduce the
OLD in-scan scale-write dataflow inline since the production op was split
into store_kv_quant_payload + scatter_scales_batch.
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


def _legacy_store_quant_decode(kc, vc, sc, li, k_new, v_new, dest):
    """The OLD in-scan store (payload scatter + per-token scale DUS) that
    this probe was written to diagnose; kept inline after the production op
    was split (quant_ops.store_kv_quant_payload + scatter_scales_batch)."""
    p = kc.shape[2]
    kq, ks = quant_ops.quantize_rows(k_new)
    vq, vs = quant_ops.quantize_rows(v_new)
    kc, vc = quant_ops.store_kv_quant_payload(kc, vc, li, kq, vq, dest)

    def tok(t, s2):
        d = jnp.maximum(dest[t], 0)
        return jax.lax.dynamic_update_slice(
            s2, jnp.stack([ks[t], vs[t]])[:, None, None, None, :],
            (0, li, d // p, d % p, 0))

    sc = jax.lax.fori_loop(0, k_new.shape[0], tok, sc)
    return kc, vc, sc


def timeit(fn, *args, n=5, thread=0):
    def rebind(out, args):
        outs = out if isinstance(out, tuple) else (out,)
        return tuple(outs[:thread]) + args[thread:]

    out = fn(*args)
    if thread:
        args = rebind(out, args)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    _ = float(jnp.sum(leaf.ravel()[:1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        if thread:
            args = rebind(out, args)
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
    scales = jnp.ones((2, L, pages, nkv, p), jnp.float32)
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
        def body(c, li):
            return attn_ops.store_kv_layer(c[0], c[1], li, k_new, v_new,
                                           dest), None
        return scan_l(body, (kc, vc))

    @jax.jit
    def int8_store_full(kc, vc, sc):
        def body(c, li):
            kc, vc, sc = c
            kc, vc, sc = _legacy_store_quant_decode(
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


def megastep_probe():
    """Composed megastep (k steps x L layers of store+attn), int8 vs bf16 —
    run via: python scripts/profile_int8_store.py --megastep"""
    import argparse
    L, nkv, nq, dh, b, p, pages, mp, k = 28, 8, 24, 128, 8, 64, 640, 76, 32
    rng = np.random.default_rng(0)
    kc8 = jnp.zeros((L, pages, p, nkv, dh), jnp.int8)
    vc8 = jnp.zeros_like(kc8)
    kcb = jnp.zeros((L, pages, p, nkv, dh), jnp.bfloat16)
    vcb = jnp.zeros_like(kcb)
    scales = jnp.ones((2, L, pages, nkv, p), jnp.float32)
    k_new = jnp.asarray(rng.normal(size=(b, nkv, dh)), jnp.bfloat16)
    v_new = jnp.asarray(rng.normal(size=(b, nkv, dh)), jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(b, nq, dh)), jnp.bfloat16)
    table = jnp.broadcast_to(jnp.arange(mp, dtype=jnp.int32)[None], (b, mp))
    ctx = jnp.full((b,), mp * p - k - 5, jnp.int32)
    dest0 = jnp.arange(b, dtype=jnp.int32) * p + 3

    def mega8(kc, vc, sc):
        def step(carry, t):
            kc, vc, sc = carry
            def layer(c, li):
                kc, vc, sc = c
                kc, vc, sc = _legacy_store_quant_decode(
                    kc, vc, sc, li, k_new, v_new, dest0 + t)
                out, _ = attn_ops.decode_attention(
                    q, kc, vc, li, table, ctx + t, sm_scale=dh ** -0.5,
                    kv_scales=sc, impl="pallas")
                return (kc, vc, sc), out.sum()
            (kc, vc, sc), outs = jax.lax.scan(
                layer, (kc, vc, sc), jnp.arange(L, dtype=jnp.int32))
            return (kc, vc, sc), outs.sum()
        (kc, vc, sc), ys = jax.lax.scan(
            step, (kc, vc, sc), jnp.arange(k, dtype=jnp.int32))
        return kc, vc, sc, ys.astype(jnp.float32).sum()

    def megab(kc, vc):
        def step(carry, t):
            kc, vc = carry
            def layer(c, li):
                kc, vc = c
                kc, vc = attn_ops.store_kv_layer(
                    kc, vc, li, k_new, v_new, dest0 + t)
                out, _ = attn_ops.decode_attention(
                    q, kc, vc, li, table, ctx + t, sm_scale=dh ** -0.5,
                    impl="pallas")
                return (kc, vc), out.sum()
            (kc, vc), outs = jax.lax.scan(
                layer, (kc, vc), jnp.arange(L, dtype=jnp.int32))
            return (kc, vc), outs.sum()
        (kc, vc), ys = jax.lax.scan(
            step, (kc, vc), jnp.arange(k, dtype=jnp.int32))
        return kc, vc, ys.astype(jnp.float32).sum()

    def mega8_nostore_scales(kc, vc, sc):
        """int8 attn reads carried-but-unmodified scales; payload stored."""
        def step(carry, t):
            kc, vc, sc = carry
            def layer(c, li):
                kc, vc, sc = c
                kq, _ = quant_ops.quantize_rows(k_new)
                vq, _ = quant_ops.quantize_rows(v_new)
                d = dest0 + t
                lix = jnp.broadcast_to(li, d.shape)
                kc = kc.at[lix, d // p, d % p].set(kq, mode="drop")
                vc = vc.at[lix, d // p, d % p].set(vq, mode="drop")
                out, _ = attn_ops.decode_attention(
                    q, kc, vc, li, table, ctx + t, sm_scale=dh ** -0.5,
                    kv_scales=sc, impl="pallas")
                return (kc, vc, sc), out.sum()
            (kc, vc, sc), outs = jax.lax.scan(
                layer, (kc, vc, sc), jnp.arange(L, dtype=jnp.int32))
            return (kc, vc, sc), outs.sum()
        (kc, vc, sc), ys = jax.lax.scan(
            step, (kc, vc, sc), jnp.arange(k, dtype=jnp.int32))
        return kc, vc, sc, ys.astype(jnp.float32).sum()

    def mega8_store_noscaleattn(kc, vc, sc):
        """full int8 store; attention WITHOUT scale read (perf probe)."""
        def step(carry, t):
            kc, vc, sc = carry
            def layer(c, li):
                kc, vc, sc = c
                kc, vc, sc = _legacy_store_quant_decode(
                    kc, vc, sc, li, k_new, v_new, dest0 + t)
                out, _ = attn_ops.decode_attention(
                    q, kc.astype(jnp.int8), vc, li, table, ctx + t,
                    sm_scale=dh ** -0.5, impl="pallas")
                return (kc, vc, sc), out.sum()
            (kc, vc, sc), outs = jax.lax.scan(
                layer, (kc, vc, sc), jnp.arange(L, dtype=jnp.int32))
            return (kc, vc, sc), outs.sum()
        (kc, vc, sc), ys = jax.lax.scan(
            step, (kc, vc, sc), jnp.arange(k, dtype=jnp.int32))
        return kc, vc, sc, ys.astype(jnp.float32).sum()

    fb = jax.jit(megab, donate_argnums=(0, 1))
    dt = timeit(fb, kcb, vcb, n=3, thread=2)
    print(f"bf16 megastep k={k}: {dt * 1e3:7.1f} ms "
          f"({dt / k * 1e3:.2f} ms/token-step)")
    f8 = jax.jit(mega8, donate_argnums=(0, 1, 2))
    dt = timeit(f8, kc8 + 0, vc8 + 0, scales + 0, n=3, thread=3)
    print(f"int8 megastep k={k}: {dt * 1e3:7.1f} ms "
          f"({dt / k * 1e3:.2f} ms/token-step)")
    f = jax.jit(mega8_nostore_scales, donate_argnums=(0, 1, 2))
    dt = timeit(f, kc8 + 0, vc8 + 0, scales + 0, n=3, thread=3)
    print(f"int8 noscalestore:  {dt * 1e3:7.1f} ms "
          f"({dt / k * 1e3:.2f} ms/token-step)")
    f = jax.jit(mega8_store_noscaleattn, donate_argnums=(0, 1, 2))
    dt = timeit(f, kc8 + 0, vc8 + 0, scales + 0, n=3, thread=3)
    print(f"int8 noscaleattn:   {dt * 1e3:7.1f} ms "
          f"({dt / k * 1e3:.2f} ms/token-step)")

    def mega8_scatter_scales(kc, vc, sc):
        """full int8: scale store via multi-dim scatter instead of fori DUS."""
        def step(carry, t):
            kc, vc, sc = carry
            def layer(c, li):
                kc, vc, sc = c
                kq, ks2 = quant_ops.quantize_rows(k_new)
                vq, vs2 = quant_ops.quantize_rows(v_new)
                d = dest0 + t
                lix = jnp.broadcast_to(li, d.shape)
                kc = kc.at[lix, d // p, d % p].set(kq, mode="drop")
                vc = vc.at[lix, d // p, d % p].set(vq, mode="drop")
                sc = sc.at[0, lix, d // p, d % p].set(ks2, mode="drop")
                sc = sc.at[1, lix, d // p, d % p].set(vs2, mode="drop")
                out, _ = attn_ops.decode_attention(
                    q, kc, vc, li, table, ctx + t, sm_scale=dh ** -0.5,
                    kv_scales=sc, impl="pallas")
                return (kc, vc, sc), out.sum()
            (kc, vc, sc), outs = jax.lax.scan(
                layer, (kc, vc, sc), jnp.arange(L, dtype=jnp.int32))
            return (kc, vc, sc), outs.sum()
        (kc, vc, sc), ys = jax.lax.scan(
            step, (kc, vc, sc), jnp.arange(k, dtype=jnp.int32))
        return kc, vc, sc, ys.astype(jnp.float32).sum()

    f = jax.jit(mega8_scatter_scales, donate_argnums=(0, 1, 2))
    dt = timeit(f, kc8 + 0, vc8 + 0, scales + 0, n=3, thread=3)
    print(f"int8 scatterscales: {dt * 1e3:7.1f} ms "
          f"({dt / k * 1e3:.2f} ms/token-step)")


if __name__ == "__main__":
    if "--megastep" in sys.argv:
        megastep_probe()
    else:
        main()
