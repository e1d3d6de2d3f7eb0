"""On-chip Pallas kernel legality + parity check (run with TPU visible).

Interpret-mode tests (tests/test_pallas_kernels.py) validate semantics but
NOT Mosaic lowering legality (tile rules, relayouts). This script compiles
and runs the decode + prefill kernels with interpret=False on the real chip
at both tiny and production-like shapes and checks them against the XLA
reference path.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from sparsevllm_tpu.ops import attention_ref as ref  # noqa: E402
from sparsevllm_tpu.ops import paged_decode as pd  # noqa: E402
from sparsevllm_tpu.ops import prefill_attention as pf  # noqa: E402


def check(name, got, want, atol):
    d = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                              - want.astype(jnp.float32))))
    status = "OK" if d <= atol else "FAIL"
    print(f"{name}: max|d|={d:.2e} (atol {atol}) {status}")
    return d <= atol


def run_case(L, pages, P, Nkv, Dh, Nq, B, MP, S, dtype, quant=False):
    rng = np.random.default_rng(0)
    label = (f"L{L} P{P} Nkv{Nkv} Dh{Dh} Nq{Nq} B{B} MP{MP} S{S} "
             f"{'int8' if quant else np.dtype(dtype).name}")
    kshape = (L, pages, P, Nkv, Dh)
    if quant:
        kc = jnp.asarray(rng.integers(-127, 128, size=kshape), jnp.int8)
        vc = jnp.asarray(rng.integers(-127, 128, size=kshape), jnp.int8)
        scales = jnp.asarray(
            rng.uniform(0.005, 0.02, size=(2, L, pages, Nkv, P)), jnp.float32)
    else:
        kc = jnp.asarray(rng.normal(size=kshape), dtype)
        vc = jnp.asarray(rng.normal(size=kshape), dtype)
        scales = None
    table = jnp.asarray(rng.integers(1, pages, size=(B, MP)), jnp.int32)
    ctx_d = jnp.asarray(rng.integers(P, MP * P + 1, size=(B,)), jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, Nq, Dh)), dtype)
    sm = Dh ** -0.5
    ok = True

    out_p, _ = pd.decode_attention_pallas(
        q, kc, vc, 1, table, ctx_d, sm_scale=sm, kv_scales=scales,
        interpret=False)
    lsc = None if scales is None else scales[:, 1]
    out_r, _ = ref.decode_attention_ref(
        q, kc[1], vc[1], table, ctx_d, sm_scale=sm, kv_scales=lsc)
    # on-TPU f32 dots run default-precision (bf16 passes): ~3e-3 abs noise
    # on BOTH sides of the comparison; semantics are pinned by the CPU
    # interpret tests at 1e-5 (tests/test_pallas_kernels.py).
    ok &= check(f"decode  {label}", out_p, out_r,
                5e-2 if dtype == jnp.bfloat16 else 2e-2)

    mask = jnp.asarray(rng.integers(0, 2, size=(B, MP * P)), bool)
    mask = mask.at[:, :P].set(True)
    out_p, _ = pd.decode_attention_pallas(
        q, kc, vc, 1, table, ctx_d, sm_scale=sm, select_mask=mask,
        kv_scales=scales, interpret=False)
    out_r, _ = ref.decode_attention_ref(
        q, kc[1], vc[1], table, ctx_d, sm_scale=sm, select_mask=mask,
        kv_scales=lsc)
    ok &= check(f"decodeM {label}", out_p, out_r,
                5e-2 if dtype == jnp.bfloat16 else 2e-2)

    qp = jnp.asarray(rng.normal(size=(B, S, Nq, Dh)), dtype)
    new = jnp.asarray(rng.integers(1, S + 1, size=(B,)), jnp.int32)
    ctx_p = new + jnp.asarray(rng.integers(0, P * 2, size=(B,)), jnp.int32)
    out_p, _ = pf.prefill_attention_pallas(
        qp, kc, vc, 0, table, ctx_p, new, sm_scale=sm, kv_scales=scales,
        interpret=False)
    lsc0 = None if scales is None else scales[:, 0]
    out_r, _ = ref.prefill_attention_ref(
        qp, kc[0], vc[0], table, ctx_p, new, sm_scale=sm, kv_scales=lsc0)
    ok &= check(f"prefill {label}", out_p, out_r,
                5e-2 if dtype == jnp.bfloat16 else 2e-2)
    return ok


def main():
    dev = jax.devices()[0]
    print(f"backend={jax.default_backend()} device={dev}")
    if jax.default_backend() == "cpu":
        print("WARNING: no TPU visible; this checks interpret only")
    ok = True
    # production-like 3B shapes
    ok &= run_case(L=2, pages=64, P=64, Nkv=8, Dh=128, Nq=24, B=4, MP=16,
                   S=128, dtype=jnp.bfloat16)
    # bigger pages
    ok &= run_case(L=2, pages=32, P=128, Nkv=8, Dh=128, Nq=24, B=4, MP=8,
                   S=128, dtype=jnp.bfloat16)
    # MHA (Nkv == Nq)
    ok &= run_case(L=2, pages=64, P=64, Nkv=8, Dh=128, Nq=8, B=2, MP=8,
                   S=64, dtype=jnp.bfloat16)
    # int8 fused dequant
    ok &= run_case(L=2, pages=64, P=64, Nkv=8, Dh=128, Nq=24, B=4, MP=16,
                   S=128, dtype=jnp.float32, quant=True)
    # tiny-random debug shapes (Dh=16 < 128 exercises block==array-dim rule)
    ok &= run_case(L=2, pages=32, P=8, Nkv=2, Dh=16, Nq=8, B=2, MP=8,
                   S=32, dtype=jnp.float32)
    # int4 (KIVI-4) fused dequant
    ok &= run_case_int4(L=2, pages=64, P=64, Nkv=8, Dh=128, Nq=24, B=4,
                        MP=16, S=128)
    # int4 fused score emission (full-layer-KIVI decode)
    ok &= run_case_int4_scores(L=2, pages=64, P=128, Nkv=8, Dh=128, Nq=24,
                               B=2, MP=8)
    # slab-combine staged-prefill attention (ops/slab_flash.py)
    ok &= run_case_slab(sb=1024, nkv=8, g=3, dh=128, nblk=3)
    print("ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)




def run_case_int4(L, pages, P, Nkv, Dh, Nq, B, MP, S):
    """int4 (KIVI-4) fused-dequant kernels vs ref, on chip."""
    import numpy as _np
    from sparsevllm_tpu.ops import quant as _q

    rng = _np.random.default_rng(1)
    kc = jnp.zeros((L, pages, P, Nkv * (Dh // 2)), jnp.int8)
    vc = jnp.zeros_like(kc)
    scales = jnp.ones((4, L, pages, Nkv, P), jnp.float32)
    k_new = jnp.asarray(rng.normal(size=(pages * P, Nkv, Dh)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(pages * P, Nkv, Dh)), jnp.float32)
    dest = jnp.arange(pages * P, dtype=jnp.int32)
    for li in range(L):
        kc, vc, scales = _q.store_kv_quant_layer_u4(
            kc, vc, scales, li, k_new, v_new, dest)
    table = jnp.asarray(rng.integers(1, pages, size=(B, MP)), jnp.int32)
    ctx = jnp.asarray(rng.integers(P, MP * P + 1, size=(B,)), jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, Nq, Dh)), jnp.float32)
    sm = Dh ** -0.5
    ok = True
    out_p, _ = pd.decode_attention_pallas(
        q, kc, vc, 1, table, ctx, sm_scale=sm, kv_scales=scales,
        interpret=False)
    out_r, _ = ref.decode_attention_ref(
        q, kc[1], vc[1], table, ctx, sm_scale=sm, kv_scales=scales[:, 1])
    ok &= check(f"decode  int4 P{P} Nkv{Nkv}", out_p, out_r, 2e-2)
    qp = jnp.asarray(rng.normal(size=(B, S, Nq, Dh)), jnp.float32)
    new = jnp.asarray(rng.integers(1, S + 1, size=(B,)), jnp.int32)
    ctx_p = new + jnp.asarray(rng.integers(0, P, size=(B,)), jnp.int32)
    out_p, _ = pf.prefill_attention_pallas(
        qp, kc, vc, 0, table, ctx_p, new, sm_scale=sm, kv_scales=scales,
        interpret=False)
    out_r, _ = ref.prefill_attention_ref(
        qp, kc[0], vc[0], table, ctx_p, new, sm_scale=sm,
        kv_scales=scales[:, 0])
    ok &= check(f"prefill int4 P{P} Nkv{Nkv}", out_p, out_r, 2e-2)
    return ok


def run_case_int4_scores(L, pages, P, Nkv, Dh, Nq, B, MP):
    """NEW r4: emit_scores over an int4 cache (in-kernel dequant + raw
    expsum fold + stats) vs the ref path — the deltakv full-layer decode."""
    import numpy as _np
    from sparsevllm_tpu.ops import quant as _q

    rng = _np.random.default_rng(3)
    kc = jnp.zeros((L, pages, P, Nkv * (Dh // 2)), jnp.int8)
    vc = jnp.zeros_like(kc)
    scales = jnp.ones((4, L, pages, Nkv, P), jnp.float32)
    k_new = jnp.asarray(rng.normal(size=(pages * P, Nkv, Dh)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(pages * P, Nkv, Dh)), jnp.float32)
    dest = jnp.arange(pages * P, dtype=jnp.int32)
    for li in range(L):
        kc, vc, scales = _q.store_kv_quant_layer_u4(
            kc, vc, scales, li, k_new, v_new, dest)
    table = jnp.asarray(rng.integers(1, pages, size=(B, MP)), jnp.int32)
    ctx = jnp.asarray(rng.integers(P, MP * P + 1, size=(B,)), jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, Nq, Dh)), jnp.float32)
    sm = Dh ** -0.5
    out_p, sc_p, m_p, l_p = pd.decode_attention_pallas(
        q, kc, vc, 1, table, ctx, sm_scale=sm, kv_scales=scales,
        emit_scores=True, return_stats=True, interpret=False)
    out_r, sc_r, m_r, l_r = ref.decode_attention_ref(
        q, kc[1], vc[1], table, ctx, sm_scale=sm, kv_scales=scales[:, 1],
        emit_scores=True, return_stats=True)
    ok = check(f"int4 scores out P{P}", out_p, out_r, 2e-2)
    ok &= check(f"int4 scores sc  P{P}", sc_p, sc_r, 1e-2)
    return ok


def run_case_slab(sb, nkv, g, dh, nblk):
    """Slab-combine flash (staged prefill) vs f32 reference attention."""
    import numpy as _np
    from sparsevllm_tpu.ops import slab_flash

    rng = _np.random.default_rng(5)
    start = (nblk - 1) * sb  # last slab slot unused (cond-skipped)
    q = jnp.asarray(rng.normal(size=(sb, nkv * g, dh)), jnp.bfloat16)
    kr = jnp.asarray(rng.normal(size=(sb, nkv, dh)), jnp.bfloat16)
    vr = jnp.asarray(rng.normal(size=(sb, nkv, dh)), jnp.bfloat16)
    ks = jnp.asarray(rng.normal(size=(nblk, nkv, sb, dh)), jnp.bfloat16)
    vs = jnp.asarray(rng.normal(size=(nblk, nkv, sb, dh)), jnp.bfloat16)
    sm = dh ** -0.5

    out = slab_flash.staged_slab_attention(
        q, kr, vr, lambda bi: (ks[bi], vs[bi]),
        jnp.asarray(start, jnp.int32),
        nblk=nblk, sb=sb, nkv=nkv, groups=g, sm_scale=sm,
    )
    # f32 reference: past = slabs [0, start), chunk causal
    k_past = jnp.concatenate(
        [ks[i].transpose(1, 0, 2) for i in range(nblk - 1)], axis=0
    )  # [start, nkv, dh]
    v_past = jnp.concatenate(
        [vs[i].transpose(1, 0, 2) for i in range(nblk - 1)], axis=0
    )
    keys = jnp.concatenate([k_past, kr], 0).astype(jnp.float32)
    vals = jnp.concatenate([v_past, vr], 0).astype(jnp.float32)
    qf = q.astype(jnp.float32).reshape(sb, nkv, g, dh)
    kk = keys.shape[0]
    st = jnp.einsum("qngd,knd->qngk", qf, keys) * sm
    kpos = jnp.arange(kk)[None, :]
    qpos = start + jnp.arange(sb)[:, None]
    st = jnp.where((kpos <= qpos)[:, None, None, :], st, -1e30)
    p = jax.nn.softmax(st, axis=-1)
    want = jnp.einsum("qngk,knd->qngd", p, vals).reshape(sb, nkv * g, dh)
    return check(f"slab flash sb{sb} nblk{nblk}", out, want, 3e-2)


if __name__ == "__main__" and "--roofline" not in __import__("sys").argv:
    main()


def bench_roofline():
    """Decode-kernel achieved bandwidth vs HBM peak + prefill MFU at the
    3B-class production shape (VERDICT r1 #4: report these in-repo)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparsevllm_tpu.ops import paged_decode as pd
    from sparsevllm_tpu.ops import prefill_attention as pf

    HBM_PEAK_GBS = 819.0  # v5e-1
    MXU_PEAK_TFLOPS = 197.0  # v5e bf16

    L, P, Nkv, Dh, Nq = 28, 128, 8, 128, 24
    B, keep = 8, 4608
    mp = -(-keep // P)
    pages = B * mp + 2
    rng = np.random.default_rng(0)
    kc = jnp.zeros((L, pages, P, Nkv, Dh), jnp.bfloat16)
    vc = jnp.zeros_like(kc)
    q = jnp.asarray(rng.normal(size=(B, Nq, Dh)), jnp.bfloat16)
    table = jnp.asarray(
        np.arange(1, B * mp + 1).reshape(B, mp), jnp.int32)
    ctx = jnp.full((B,), keep, jnp.int32)

    def run_decode(li):
        out, _ = pd.decode_attention_pallas(
            q, kc, vc, li, table, ctx, sm_scale=0.088, interpret=False)
        return out

    run_decode(0).block_until_ready()
    t0 = time.perf_counter()
    reps = 20
    for i in range(reps):
        o = run_decode(i % L)
    o.block_until_ready(); np.asarray(o[0, 0, :1])
    dt = (time.perf_counter() - t0) / reps
    kv_bytes = 2 * B * mp * P * Nkv * Dh * 2  # K+V streamed per call
    gbs = kv_bytes / dt / 2**30
    print(f"decode kernel bs={B} keep={keep}: {dt*1e3:.2f} ms/layer, "
          f"{gbs:.0f} GiB/s = {100*gbs/HBM_PEAK_GBS:.0f}% of HBM peak")

    S, ctx_pages = 8192, 256
    pages2 = ctx_pages + 1
    kc2 = jnp.zeros((L, pages2, P, Nkv, Dh), jnp.bfloat16)
    vc2 = jnp.zeros_like(kc2)
    qp = jnp.asarray(rng.normal(size=(1, S, Nq, Dh)), jnp.bfloat16)
    t2 = jnp.asarray(np.arange(1, ctx_pages + 1)[None], jnp.int32)
    cl = jnp.asarray([ctx_pages * P], jnp.int32)
    nl = jnp.asarray([S], jnp.int32)

    def run_prefill(li):
        out, _ = pf.prefill_attention_pallas(
            qp, kc2, vc2, li, t2, cl, nl, sm_scale=0.088, interpret=False)
        return out

    run_prefill(0).block_until_ready()
    t0 = time.perf_counter()
    for i in range(8):
        o = run_prefill(i % L)
    o.block_until_ready(); np.asarray(o[0, 0, 0, :1])
    dt = (time.perf_counter() - t0) / 8
    # causal-valid flops only (~ everything: queries are the ctx tail)
    fl = 4 * S * Nq * (ctx_pages * P - S / 2) * Dh
    print(f"prefill kernel S={S} ctx={ctx_pages*P}: {dt*1e3:.0f} ms/layer, "
          f"{fl/dt/1e12:.1f} TFLOP/s = "
          f"{100*fl/dt/1e12/MXU_PEAK_TFLOPS:.0f}% MXU")


if __name__ == "__main__" and "--roofline" in __import__("sys").argv:
    bench_roofline()
