"""KIVI-2 int2 full-KV cache: per-channel K quant, kernels, tail merge, E2E.

The KIVI recipe at 2 bits (reference triton_kernel/quant.py per-channel K
path + deltakv_less_memory.py INT2 full layers): K quantized PER CHANNEL
over token groups, V per token, raw fp residual window. Here the residual
window is the partial tail page — decode runs the kernel over COMPLETE
quantized pages and merges the raw tail exactly via the kernel's (m, l)
stats (ops/attention.py merge_tail_attention).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsevllm_tpu.engine.llm_engine import LLM
from sparsevllm_tpu.ops import attention_ref as ref
from sparsevllm_tpu.ops import paged_decode as pd
from sparsevllm_tpu.ops import prefill_attention as pf
from sparsevllm_tpu.ops import quant
from sparsevllm_tpu.ops.attention import merge_tail_attention
from sparsevllm_tpu.sampling_params import SamplingParams

P, G, NKV, DH = 32, 8, 2, 128


def test_int2_k_channel_roundtrip_bound():
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(size=(P, NKV, DH)) * 2.0, jnp.float32)
    packed, scale, zero = quant.quantize_page_k_int2(x, G)
    assert packed.shape == (P, NKV, DH // 4) and packed.dtype == jnp.int8
    assert scale.shape == (P // G, NKV, DH)
    back = quant.dequantize_page_k_int2(packed, scale, zero, G)
    err = np.abs(np.asarray(back) - np.asarray(x))
    bound = np.repeat(np.asarray(scale), G, axis=0) * 0.5 + 1e-5
    assert np.all(err <= bound)


def test_int2_k_outlier_channel_isolated():
    """Per-CHANNEL stats: one huge channel must not destroy the others
    (the KIVI finding — per-token K quant at 2 bits fails exactly here)."""
    rng = np.random.default_rng(32)
    x = np.asarray(rng.normal(size=(P, 1, DH)), np.float32)
    x[:, 0, 7] *= 100.0  # outlier channel
    packed, scale, zero = quant.quantize_page_k_int2(jnp.asarray(x), G)
    back = np.asarray(quant.dequantize_page_k_int2(packed, scale, zero, G))
    other = [c for c in range(DH) if c != 7]
    err = np.abs(back[:, 0, other] - x[:, 0, other])
    assert err.max() < 1.0  # normal channels keep their own tight scale


def test_int2_k_valid_len_masked_stats():
    """Partial-page quantization: stats ignore rows >= valid_len, so valid
    rows roundtrip within their own bound regardless of garbage rows."""
    rng = np.random.default_rng(33)
    x = np.asarray(rng.normal(size=(P, NKV, DH)), np.float32)
    x[20:] = 1e6  # stale garbage past the valid prefix
    packed, scale, zero = quant.quantize_page_k_int2(
        jnp.asarray(x), G, valid_len=jnp.int32(20)
    )
    back = np.asarray(quant.dequantize_page_k_int2(packed, scale, zero, G))
    bound = np.repeat(np.asarray(scale), G, axis=0) * 0.5 + 1e-5
    assert np.all(np.abs(back[:20] - x[:20]) <= bound[:20])


def test_int2_v_per_token_roundtrip_bound():
    rng = np.random.default_rng(34)
    x = jnp.asarray(rng.normal(size=(P, NKV, DH)) * 3.0, jnp.float32)
    packed, scale, zero = quant.quantize_page_v_int2(x)
    assert packed.shape == (P, NKV, DH // 4)
    back = quant.dequantize_page_v_int2(packed, scale, zero)
    err = np.abs(np.asarray(back) - np.asarray(x))
    bound = np.asarray(scale)[..., None] * 0.5 + 1e-5
    assert np.all(err <= bound)


@pytest.fixture(scope="module")
def int2_caches():
    """int2 caches + V scales + per-channel K scales via the page store."""
    rng = np.random.default_rng(35)
    L, pages = 2, 12
    kc = jnp.zeros((L, pages, P, NKV, DH // 4), jnp.int8)
    vc = jnp.zeros((L, pages, P, NKV, DH // 4), jnp.int8)
    vsc = jnp.ones((2, L, pages, NKV, P), jnp.float32)
    kch = jnp.ones((2, L, pages, P // G, NKV, DH), jnp.float32)
    npg = 8  # pages 1..8 hold 8*P tokens
    k_new = jnp.asarray(rng.normal(size=(npg, P, NKV, DH)) * 2.0,
                        jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(npg, P, NKV, DH)), jnp.float32)
    dest = jnp.arange(1, npg + 1, dtype=jnp.int32)
    vlen = jnp.full((npg,), P, jnp.int32)
    for li in range(2):
        kc, vc, vsc, kch = quant.store_pages_int2(
            kc, vc, vsc, kch, li, k_new, v_new, dest, vlen, G
        )
    return kc, vc, vsc, kch, k_new, v_new


def test_decode_int2_kernel_matches_ref(int2_caches):
    kc, vc, vsc, kch, _, _ = int2_caches
    rng = np.random.default_rng(36)
    B, Nq, MP = 2, 4, 8
    q = jnp.asarray(rng.normal(size=(B, Nq, DH)), jnp.float32)
    table = jnp.asarray(
        np.broadcast_to(np.arange(1, 9), (B, MP)).copy(), jnp.int32
    )
    ctx = jnp.asarray([5 * P, 8 * P], jnp.int32)  # complete pages only
    out_p, _ = pd.decode_attention_pallas(
        q, kc, vc, 1, table, ctx, sm_scale=0.1, kv_scales=vsc,
        k_ch_scales=kch, interpret=True,
    )
    out_r, _ = ref.decode_attention_ref(
        q, kc[1], vc[1], table, ctx, sm_scale=0.1, kv_scales=vsc[:, 1],
        k_ch_scales=kch[:, 1],
    )
    np.testing.assert_allclose(out_p, out_r, atol=3e-5)


def test_prefill_int2_kernel_matches_ref(int2_caches):
    kc, vc, vsc, kch, _, _ = int2_caches
    rng = np.random.default_rng(37)
    B, S, Nq, MP = 2, 32, 4, 8
    q = jnp.asarray(rng.normal(size=(B, S, Nq, DH)), jnp.float32)
    table = jnp.asarray(
        np.broadcast_to(np.arange(1, 9), (B, MP)).copy(), jnp.int32
    )
    ctx = jnp.asarray([4 * P, 3 * P], jnp.int32)
    new = jnp.asarray([32, 20], jnp.int32)
    out_p, _ = pf.prefill_attention_pallas(
        q, kc, vc, 0, table, ctx, new, sm_scale=0.1, kv_scales=vsc,
        k_ch_scales=kch, interpret=True,
    )
    out_r, _ = ref.prefill_attention_ref(
        q, kc[0], vc[0], table, ctx, new, sm_scale=0.1,
        kv_scales=vsc[:, 0], k_ch_scales=kch[:, 0],
    )
    np.testing.assert_allclose(out_p, out_r, atol=3e-5)


def test_int2_attention_close_to_fp(int2_caches):
    """int2 attention output stays within sanity distance of unquantized
    (2-bit noise; exactness is pinned by kernel-vs-ref parity above)."""
    kc, vc, vsc, kch, k_new, v_new = int2_caches
    rng = np.random.default_rng(38)
    q = jnp.asarray(rng.normal(size=(1, 4, DH)) * 0.3, jnp.float32)
    table = jnp.asarray(np.arange(1, 9)[None, :], jnp.int32)
    ctx = jnp.asarray([8 * P], jnp.int32)
    out_q, _ = ref.decode_attention_ref(
        q, kc[0], vc[0], table, ctx, sm_scale=0.05, kv_scales=vsc[:, 0],
        k_ch_scales=kch[:, 0],
    )
    kc_f = jnp.zeros((12, P, NKV, DH), jnp.float32)
    vc_f = jnp.zeros_like(kc_f)
    dest = jnp.arange(8 * P, dtype=jnp.int32) + P
    kc_f, vc_f = ref.store_kv(
        kc_f, vc_f, k_new.reshape(-1, NKV, DH), v_new.reshape(-1, NKV, DH),
        dest,
    )
    out_f, _ = ref.decode_attention_ref(
        q, kc_f, vc_f, table, ctx, sm_scale=0.05,
    )
    np.testing.assert_allclose(out_q, out_f, atol=0.35, rtol=0.35)


def test_merge_tail_attention_exact():
    """Stats-form history + raw tail must equal one softmax over both —
    the KIVI-2 decode path's correctness hinges on this identity."""
    rng = np.random.default_rng(39)
    B, Nq, T = 2, 8, 12  # GQA g=4 over NKV=2
    hist = 3 * P  # complete-page history
    q = jnp.asarray(rng.normal(size=(B, Nq, DH)), jnp.float32)
    k_h = jnp.asarray(rng.normal(size=(hist, NKV, DH)), jnp.float32)
    v_h = jnp.asarray(rng.normal(size=(hist, NKV, DH)), jnp.float32)
    kc_f = jnp.zeros((8, P, NKV, DH), jnp.float32)
    vc_f = jnp.zeros_like(kc_f)
    dest = jnp.arange(hist, dtype=jnp.int32)
    kc_f, vc_f = ref.store_kv(kc_f, vc_f, k_h, v_h, dest)
    table = jnp.asarray(np.broadcast_to(np.arange(4), (B, 4)).copy(),
                        jnp.int32)
    ctx = jnp.asarray([hist, hist], jnp.int32)
    out_h, m_h, l_h = ref.decode_attention_ref(
        q, kc_f, vc_f, table, ctx, sm_scale=0.08, return_stats=True,
    )
    k_t = jnp.asarray(rng.normal(size=(B, P, NKV, DH)), jnp.float32)
    v_t = jnp.asarray(rng.normal(size=(B, P, NKV, DH)), jnp.float32)
    tail_len = jnp.asarray([T, 1], jnp.int32)
    out = merge_tail_attention(
        out_h, m_h, l_h, q, k_t, v_t, tail_len, sm_scale=0.08,
    )
    # oracle: plain softmax over history + valid tail rows, per batch lane
    g = Nq // NKV
    for b in range(B):
        t = int(tail_len[b])
        k_all = jnp.concatenate([k_h, k_t[b, :t]], axis=0)  # [H+t, NKV, DH]
        v_all = jnp.concatenate([v_h, v_t[b, :t]], axis=0)
        kf = jnp.repeat(k_all, g, axis=1)  # [H+t, Nq, DH]
        vf = jnp.repeat(v_all, g, axis=1)
        s = jnp.einsum("hd,thd->ht", q[b], kf) * 0.08
        w = jax.nn.softmax(s, axis=-1)
        expect = jnp.einsum("ht,thd->hd", w, vf)
        np.testing.assert_allclose(out[b], expect, atol=2e-5)


# --------------------------------------------------------------- config

BASE = dict(
    tiny_random=True,
    dtype="float32",
    page_size=8,
    num_kv_pages=256,
    max_model_len=512,
    chunk_prefill_size=64,
    max_num_batched_tokens=512,
    max_decoding_seqs=4,
    max_num_seqs_in_batch=4,
    decode_context_bucket_base=64,
    decode_steps_per_dispatch=4,
)


def test_int2_rejects_compacting_methods():
    with pytest.raises(NotImplementedError, match="vanilla | streamingllm"):
        LLM(kv_cache_dtype="int2", sparse_method="snapkv",
            prefill_keep_tokens=64, kivi_group_size=4, **BASE)


def test_int2_rejects_nondividing_group():
    with pytest.raises(ValueError, match="must divide"):
        LLM(kv_cache_dtype="int2", kivi_group_size=3, **BASE)


def test_int2_rejects_unaligned_chunk():
    kw = dict(BASE)
    kw["chunk_prefill_size"] = 60
    with pytest.raises(ValueError, match="chunk_prefill_size"):
        LLM(kv_cache_dtype="int2", kivi_group_size=4, **kw)


# ------------------------------------------------------------------ E2E


def test_e2e_int2_oracle_recall():
    """Associative recall through the production engine with the int2
    cache: the constructed induction oracle retrieves exactly at dense
    (ACCURACY.md); int2 must preserve recall through prefill page quant,
    decode tail accumulation, AND a decode-time page flush."""
    from benchmark import induction_oracle
    from benchmark.accuracy_ladder import build_recall_case
    from sparsevllm_tpu.engine.llm_engine import LLMEngine

    spec = induction_oracle.oracle_spec()
    params = induction_oracle.build_params(0)
    rng = np.random.default_rng(40)
    ctx = 256
    cases = []
    for d in (0.2, 0.5, 0.8):
        full, ans_starts, out_vals = build_recall_case(rng, ctx, d)
        # prompt ends just before ANS_MARK: step 1 must emit ANS_MARK
        # (bigram MLP), step 2 the recalled value (induction heads)
        cases.append((full[:ans_starts[0] - 1], out_vals[0]))
    engine = LLMEngine(
        spec=spec, params=params, dtype="float32",
        kv_cache_dtype="int2", kivi_group_size=8,
        page_size=32, num_kv_pages=64, max_model_len=ctx + 64,
        chunk_prefill_size=128, max_num_batched_tokens=1024,
        max_decoding_seqs=4, max_num_seqs_in_batch=4,
        decode_context_bucket_base=64, decode_steps_per_dispatch=2,
    )
    outs = engine.generate(
        prompt_token_ids=[c[0] for c in cases],
        # 34 steps: decode crosses a page boundary (ctx%32==0 flush fires)
        sampling_params=SamplingParams(temperature=0.0, max_tokens=34,
                                       ignore_eos=True),
    )
    from benchmark.accuracy_ladder import ANS_MARK
    for out, (_, ans) in zip(outs, cases):
        assert out.output_token_ids[:2] == [ANS_MARK] + list(ans)
    engine.exit()


def test_e2e_int2_streamingllm():
    """streamingllm + int2: whole-page window evictions never re-gather
    quantized rows, so the combination is admitted and must run."""
    rng = np.random.default_rng(41)
    prompt = [int(t) for t in rng.integers(3, 500, size=150)]
    eng = LLM(
        kv_cache_dtype="int2", kivi_group_size=4,
        sparse_method="streamingllm",
        sink_keep_tokens=8, recent_keep_tokens=32, **BASE,
    )
    outs = eng.generate(
        prompt_token_ids=[prompt],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=12,
                                       ignore_eos=True),
    )
    assert len(outs[0].output_token_ids) == 12
