"""Pallas kernel vs XLA-reference parity (interpret mode on CPU).

Mirrors the reference kernel-vs-eager test pattern
(tests/test_deltakv_less_memory_kernel.py, test_prefill_score_kernel.py):
each hand-written kernel is checked against the pure-XLA semantics in
ops/attention_ref.py. On CPU the kernels run in Pallas interpret mode; the
same code compiles through Mosaic on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsevllm_tpu.ops import attention_ref as ref
from sparsevllm_tpu.ops import paged_decode as pd
from sparsevllm_tpu.ops import prefill_attention as pf


@pytest.fixture(scope="module")
def caches():
    rng = np.random.default_rng(0)
    L, pages, Nkv, P, Dh = 3, 32, 2, 8, 128
    kc = jnp.asarray(rng.normal(size=(L, pages, P, Nkv, Dh)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(L, pages, P, Nkv, Dh)), jnp.float32)
    return kc, vc


def test_decode_matches_ref(caches):
    kc, vc = caches
    rng = np.random.default_rng(1)
    B, Nq, MP, P = 3, 4, 6, kc.shape[2]
    q = jnp.asarray(rng.normal(size=(B, Nq, 128)), jnp.float32)
    table = jnp.asarray(rng.integers(1, kc.shape[1], size=(B, MP)), jnp.int32)
    ctx = jnp.asarray([5, 33, 48], jnp.int32)
    out_p, _ = pd.decode_attention_pallas(
        q, kc, vc, 1, table, ctx, sm_scale=0.088, interpret=True
    )
    out_r, _ = ref.decode_attention_ref(
        q, kc[1], vc[1], table, ctx, sm_scale=0.088
    )
    np.testing.assert_allclose(out_p, out_r, atol=2e-5)


def test_decode_select_mask_matches_ref(caches):
    kc, vc = caches
    rng = np.random.default_rng(2)
    B, Nq, MP, P = 3, 4, 6, kc.shape[2]
    q = jnp.asarray(rng.normal(size=(B, Nq, 128)), jnp.float32)
    table = jnp.asarray(rng.integers(1, kc.shape[1], size=(B, MP)), jnp.int32)
    ctx = jnp.asarray([17, 40, 48], jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, size=(B, MP * P)), bool)
    mask = mask.at[:, :2].set(True)  # never fully masked
    out_p, _ = pd.decode_attention_pallas(
        q, kc, vc, 2, table, ctx, sm_scale=0.088, select_mask=mask,
        interpret=True,
    )
    out_r, _ = ref.decode_attention_ref(
        q, kc[2], vc[2], table, ctx, sm_scale=0.088, select_mask=mask
    )
    np.testing.assert_allclose(out_p, out_r, atol=2e-5)


def test_prefill_matches_ref(caches):
    kc, vc = caches
    rng = np.random.default_rng(3)
    B, S, Nq, MP = 2, 16, 4, 8
    q = jnp.asarray(rng.normal(size=(B, S, Nq, 128)), jnp.float32)
    table = jnp.asarray(rng.integers(1, kc.shape[1], size=(B, MP)), jnp.int32)
    # seq0: 4 cached + 16 new; seq1: padded chunk (9 of 16 valid)
    ctx = jnp.asarray([20, 13], jnp.int32)
    new = jnp.asarray([16, 9], jnp.int32)
    out_p, _ = pf.prefill_attention_pallas(
        q, kc, vc, 0, table, ctx, new, sm_scale=0.088, interpret=True
    )
    out_r, _ = ref.prefill_attention_ref(
        q, kc[0], vc[0], table, ctx, new, sm_scale=0.088
    )
    np.testing.assert_allclose(out_p, out_r, atol=2e-5)


def test_prefill_first_chunk_no_prefix(caches):
    kc, vc = caches
    rng = np.random.default_rng(4)
    B, S, Nq, MP = 2, 8, 4, 4
    q = jnp.asarray(rng.normal(size=(B, S, Nq, 128)), jnp.float32)
    table = jnp.asarray(rng.integers(1, kc.shape[1], size=(B, MP)), jnp.int32)
    ctx = jnp.asarray([8, 3], jnp.int32)
    new = jnp.asarray([8, 3], jnp.int32)
    out_p, _ = pf.prefill_attention_pallas(
        q, kc, vc, 1, table, ctx, new, sm_scale=0.25, interpret=True
    )
    out_r, _ = ref.prefill_attention_ref(
        q, kc[1], vc[1], table, ctx, new, sm_scale=0.25
    )
    np.testing.assert_allclose(out_p, out_r, atol=2e-5)


def test_obs_window_falls_back_to_ref(caches):
    """Score-emitting prefill must return identical scores to the ref path."""
    kc, vc = caches
    rng = np.random.default_rng(5)
    B, S, Nq, MP = 2, 16, 4, 4
    q = jnp.asarray(rng.normal(size=(B, S, Nq, 128)), jnp.float32)
    table = jnp.asarray(rng.integers(1, kc.shape[1], size=(B, MP)), jnp.int32)
    ctx = jnp.asarray([30, 16], jnp.int32)
    new = jnp.asarray([16, 16], jnp.int32)
    out_p, obs_p = pf.prefill_attention_pallas(
        q, kc, vc, 0, table, ctx, new, sm_scale=0.088, obs_window=4,
        score_pooling=3, interpret=True,
    )
    out_r, obs_r = ref.prefill_attention_ref(
        q, kc[0], vc[0], table, ctx, new, sm_scale=0.088, obs_window=4,
        score_pooling=3,
    )
    np.testing.assert_allclose(out_p, out_r, atol=2e-5)
    np.testing.assert_allclose(obs_p, obs_r, atol=2e-5)


def test_decode_compacted_page_table_matches_ref(caches):
    """Quest-style compacted tables: a permuted subset of pages with
    page_pos must equal full attention restricted to those pages."""
    kc, vc = caches
    rng = np.random.default_rng(6)
    B, Nq, MP, P = 2, 4, 8, kc.shape[2]
    q = jnp.asarray(rng.normal(size=(B, Nq, 128)), jnp.float32)
    table = jnp.asarray(rng.integers(1, kc.shape[1], size=(B, MP)), jnp.int32)
    ctx = jnp.asarray([60, 44], jnp.int32)
    # pick logical pages {0, 2, 5, last} in scrambled order
    ppos = jnp.asarray([[5, 0, 7, 2], [2, 5, 0, 3]], jnp.int32)
    compact = jnp.take_along_axis(table, ppos, axis=1)
    out_p, _ = pd.decode_attention_pallas(
        q, kc, vc, 1, compact, ctx, sm_scale=0.1, page_pos=ppos,
        interpret=True,
    )
    # reference: full table with a token mask selecting the same pages
    mask = np.zeros((B, MP * P), bool)
    for b in range(B):
        for lp in np.asarray(ppos[b]):
            mask[b, lp * P:(lp + 1) * P] = True
    out_r, _ = ref.decode_attention_ref(
        q, kc[1], vc[1], table, ctx, sm_scale=0.1,
        select_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(out_p, out_r, atol=2e-5)


def test_decode_score_pass_matches_ref(caches):
    """Score pass (stats-form K-only sweep) == ref emit_scores."""
    kc, vc = caches
    rng = np.random.default_rng(7)
    B, Nq, MP = 3, 4, 6
    q = jnp.asarray(rng.normal(size=(B, Nq, 128)), jnp.float32)
    table = jnp.asarray(rng.integers(1, kc.shape[1], size=(B, MP)), jnp.int32)
    ctx = jnp.asarray([17, 40, 48], jnp.int32)
    out_s, m, l = pd.decode_attention_pallas(
        q, kc, vc, 1, table, ctx, sm_scale=0.088, interpret=True,
        return_stats=True,
    )
    scores_p = pd.decode_scores_pallas(
        q, kc, 1, table, ctx, m, l, sm_scale=0.088, interpret=True,
    )
    out_r, scores_r = ref.decode_attention_ref(
        q, kc[1], vc[1], table, ctx, sm_scale=0.088, emit_scores=True,
    )
    np.testing.assert_allclose(out_s, out_r, atol=2e-5)
    np.testing.assert_allclose(scores_p, scores_r, atol=2e-5)


def test_decode_stats_merge_matches_full(caches):
    """(out,m,l) over ctx-1 merged with the excluded token == full ref."""
    from sparsevllm_tpu.ops import attention as attn_ops

    kc, vc = caches
    rng = np.random.default_rng(8)
    B, Nq, Nkv, MP, P = 2, 4, kc.shape[3], 4, kc.shape[2]
    q = jnp.asarray(rng.normal(size=(B, Nq, 128)), jnp.float32)
    table = jnp.asarray(rng.integers(1, kc.shape[1], size=(B, MP)), jnp.int32)
    ctx = jnp.asarray([13, 25], jnp.int32)
    out_h, m, l = pd.decode_attention_pallas(
        q, kc, vc, 0, table, ctx - 1, sm_scale=0.1, interpret=True,
        return_stats=True,
    )
    # the "current token" = the cache entry at position ctx-1
    last = ctx - 1
    pg = jnp.take_along_axis(table, (last // P)[:, None], axis=1)[:, 0]
    k_cur = kc[0][pg, last % P]  # [B, Nkv, Dh]
    v_cur = vc[0][pg, last % P]
    merged = attn_ops.merge_token_attention(
        out_h, m, l, q, k_cur, v_cur, sm_scale=0.1)
    out_full, _ = ref.decode_attention_ref(
        q, kc[0], vc[0], table, ctx, sm_scale=0.1)
    np.testing.assert_allclose(merged, out_full, atol=2e-5)


def test_decode_emit_scores_single_sweep_matches_ref(caches):
    """emit_scores through the pallas path (raw expsums + late
    normalization) == ref emit_scores."""
    kc, vc = caches
    rng = np.random.default_rng(9)
    B, Nq, MP = 3, 4, 6
    q = jnp.asarray(rng.normal(size=(B, Nq, 128)), jnp.float32)
    table = jnp.asarray(rng.integers(1, kc.shape[1], size=(B, MP)), jnp.int32)
    ctx = jnp.asarray([17, 40, 48], jnp.int32)
    out_p, scores_p = pd.decode_attention_pallas(
        q, kc, vc, 2, table, ctx, sm_scale=0.088, emit_scores=True,
        interpret=True,
    )
    out_r, scores_r = ref.decode_attention_ref(
        q, kc[2], vc[2], table, ctx, sm_scale=0.088, emit_scores=True,
    )
    np.testing.assert_allclose(out_p, out_r, atol=2e-5)
    np.testing.assert_allclose(scores_p, scores_r, atol=2e-5)


def test_decode_mask_with_compacted_table_matches_ref(caches):
    """OmniKV compacted path: permuted table + select_mask + page_pos
    together (ADVICE r1: page_pos was silently dropped when a mask was
    set, mis-masking short contexts)."""
    kc, vc = caches
    rng = np.random.default_rng(10)
    B, Nq, MP, P = 2, 4, 8, kc.shape[2]
    q = jnp.asarray(rng.normal(size=(B, Nq, 128)), jnp.float32)
    table = jnp.asarray(rng.integers(1, kc.shape[1], size=(B, MP)), jnp.int32)
    # short contexts: some selected logical pages sit near/over ctx
    ctx = jnp.asarray([23, 44], jnp.int32)
    ppos = jnp.asarray([[2, 0, 5, 1], [4, 2, 0, 3]], jnp.int32)
    compact = jnp.take_along_axis(table, ppos, axis=1)
    # per-token keep mask in COMPACTED order
    cmask_np = rng.integers(0, 2, size=(B, ppos.shape[1] * P)).astype(bool)
    cmask_np[:, :3] = True
    cmask = jnp.asarray(cmask_np)
    out_p, _ = pd.decode_attention_pallas(
        q, kc, vc, 1, compact, ctx, sm_scale=0.1, select_mask=cmask,
        page_pos=ppos, interpret=True,
    )
    # reference: full table + mask scattered back to logical positions
    mask = np.zeros((B, MP * P), bool)
    for b in range(B):
        for j, lp in enumerate(np.asarray(ppos[b])):
            mask[b, lp * P:(lp + 1) * P] = cmask_np[b, j * P:(j + 1) * P]
    out_r, _ = ref.decode_attention_ref(
        q, kc[1], vc[1], table, ctx, sm_scale=0.1,
        select_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(out_p, out_r, atol=2e-5)


def test_obs_scores_blockwise_matches_ref(caches):
    """Blockwise two-pass obs scores == naive ref obs path (which
    materializes [B, Nq, S, K] and cannot run at 128K)."""
    kc, vc = caches
    rng = np.random.default_rng(11)
    B, S, Nq, MP = 2, 16, 4, 6
    q = jnp.asarray(rng.normal(size=(B, S, Nq, 128)), jnp.float32)
    table = jnp.asarray(rng.integers(1, kc.shape[1], size=(B, MP)), jnp.int32)
    ctx = jnp.asarray([30, 13], jnp.int32)
    new = jnp.asarray([16, 9], jnp.int32)
    for pool in (0, 3):
        _, obs_r = ref.prefill_attention_ref(
            q, kc[0], vc[0], table, ctx, new, sm_scale=0.088, obs_window=6,
            score_pooling=pool,
        )
        obs_b = ref.prefill_obs_scores_blockwise(
            q, kc[0], table, ctx, new, sm_scale=0.088, obs_window=6,
            score_pooling=pool, block_pages=2,
        )
        np.testing.assert_allclose(obs_b, obs_r, atol=2e-5)
    # obs window larger than the prompt (short-prompt validity masking)
    ctx2 = jnp.asarray([4, 3], jnp.int32)
    new2 = jnp.asarray([4, 3], jnp.int32)
    _, obs_r = ref.prefill_attention_ref(
        q, kc[0], vc[0], table, ctx2, new2, sm_scale=0.088, obs_window=8,
    )
    obs_b = ref.prefill_obs_scores_blockwise(
        q, kc[0], table, ctx2, new2, sm_scale=0.088, obs_window=8,
        block_pages=4,
    )
    np.testing.assert_allclose(obs_b, obs_r, atol=2e-5)


def test_obs_scores_blockwise_int8(caches):
    """Blockwise obs scores over a quantized (int8) cache."""
    from sparsevllm_tpu.ops import quant as quant_ops

    kc3, _ = caches
    kc = kc3[0]  # one layer: [pages, P, Nkv, Dh]
    rng = np.random.default_rng(12)
    B, S, Nq, MP, P = 1, 8, 4, 4, kc.shape[1]
    Nkv, Dh = kc.shape[2], kc.shape[3]
    q = jnp.asarray(rng.normal(size=(B, S, Nq, Dh)), jnp.float32)
    table = jnp.asarray([[3, 7, 1, 5]], jnp.int32)
    ctx = jnp.asarray([28], jnp.int32)
    new = jnp.asarray([8], jnp.int32)
    # quantize the fp cache (per-token symmetric, ops/quant.py)
    flat = kc.reshape(-1, Nkv, Dh)
    kq, ks = quant_ops.quantize_rows(flat)
    kq = kq.reshape(kc.shape)
    ks_pg = ks.reshape(kc.shape[:3]).transpose(0, 2, 1)  # [pages, Nkv, P]
    scales = jnp.stack([ks_pg, ks_pg])  # [2, pages, Nkv, P]
    deq = quant_ops.dequantize_rows(
        kq.reshape(-1, Nkv, Dh), ks).reshape(kc.shape)
    _, obs_r = ref.prefill_attention_ref(
        q, deq, deq, table, ctx, new, sm_scale=0.1, obs_window=4,
    )
    obs_b = ref.prefill_obs_scores_blockwise(
        q, kq, table, ctx, new, sm_scale=0.1, obs_window=4,
        kv_scales=scales, block_pages=2,
    )
    np.testing.assert_allclose(obs_b, obs_r, atol=2e-4)
