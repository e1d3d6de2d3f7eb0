"""DeltaKV incremental reconstruction cache (ops/deltakv.py recon cache).

The cache must be SEMANTICALLY INVISIBLE: records/centers are immutable
once written, so attending over cached reconstructions equals re-running
the full gather->dequant->up->+ref->re-RoPE chain every step (the r4
path). These tests pin:

  * the set-diff/slot-assignment algebra of recon_group_refresh
  * engine-level token parity: recon_cache on vs off produce identical
    greedy tokens across multiple decode dispatches (covering refresh
    drift, cache persistence across dispatches, and invalidation after
    tail re-compression)

Mirrors the reference's kernel-vs-eager tier
(tests/test_deltakv_less_memory_kernel.py tolerances; here the paths are
the same math, so equality is exact).
"""

from __future__ import annotations

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from sparsevllm_tpu.ops import deltakv as dk_ops  # noqa: E402


# ------------------------------------------------- group refresh algebra


def refresh_np(prev, new, pad):
    st, nt, ns, adm, lag = dk_ops.recon_group_refresh(
        jnp.asarray(prev, jnp.int32), jnp.asarray(new, jnp.int32), pad
    )
    return (np.asarray(st), np.asarray(nt), np.asarray(ns),
            np.asarray(adm), np.asarray(lag))


def test_refresh_identity_selection_no_churn():
    prev = np.array([[5, 9, 2, 7]])
    st, nt, ns, adm, lag = refresh_np(prev, prev, pad=2)
    assert not lag[0]
    assert (ns == 4).all()  # no slots assigned
    assert not adm.any()
    assert (st == prev).all()


def test_refresh_single_swap_assigns_evicted_slot():
    prev = np.array([[5, 9, 2, 7]])
    new = np.array([[5, 9, 11, 7]])  # 2 -> 11
    st, nt, ns, adm, lag = refresh_np(prev, new, pad=2)
    assert not lag[0]
    assert nt[0, 0] == 11 and ns[0, 0] == 2  # slot that held token 2
    assert ns[0, 1] == 4  # pad sentinel
    assert adm[0].tolist() == [False, False, True, False]
    assert st[0].tolist() == [5, 9, 11, 7]


def test_refresh_multi_swap_ranks_align():
    prev = np.array([[10, 20, 30, 40, 50, 60]])
    new = np.array([[10, 21, 30, 41, 50, 61]])
    st, nt, ns, adm, lag = refresh_np(prev, new, pad=4)
    assert not lag[0]
    assert sorted(st[0].tolist()) == sorted(new[0].tolist())
    # each new token sits in a slot that previously held an evicted one
    for tok, slot in zip(nt[0, :3], ns[0, :3]):
        assert prev[0, slot] in (20, 40, 60)
        assert st[0, slot] == tok


def test_refresh_lag_on_excess_drift_partial_admit():
    """Drift beyond pad: admit exactly pad tokens, flag lag; a following
    refresh with the same selection admits the rest and clears lag."""
    prev = np.array([[1, 2, 3, 4]])
    new = np.array([[5, 6, 7, 8]])
    st, nt, ns, adm, lag = refresh_np(prev, new, pad=2)
    assert lag[0]
    assert adm[0].sum() == 2
    st2, _, _, _, lag2 = refresh_np(st, new, pad=2)
    assert not lag2[0]
    assert sorted(st2[0].tolist()) == [5, 6, 7, 8]


def test_refresh_invalidated_cache_rebuilds_when_pad_allows():
    """All-(-1) content after invalidation: every slot evicts and every
    new token is assigned — a correct in-place rebuild, no overflow."""
    prev = np.full((1, 4), -1)
    new = np.array([[5, 6, 7, 8]])
    st, nt, ns, adm, lag = refresh_np(prev, new, pad=4)
    assert not lag[0]
    assert sorted(st[0].tolist()) == [5, 6, 7, 8]


def test_refresh_lag_on_duplicate_rank_mismatch():
    """Duplicate prev content shrinks the evictable set below the new
    count: admit what fits, flag lag (full-attend path this step)."""
    prev = np.array([[5, 5, 6, 7]])
    new = np.array([[5, 6, 7, 8]])
    _, _, _, _, lag = refresh_np(prev, new, pad=4)
    assert lag[0]


def test_refresh_invalidated_cache_lags_past_pad_then_catches_up():
    prev = np.full((1, 6), -1)
    new = np.array([[1, 2, 3, 4, 5, 6]])
    st, _, _, adm, lag = refresh_np(prev, new, pad=4)
    assert lag[0] and adm[0].sum() == 4
    st2, _, _, _, lag2 = refresh_np(st, new, pad=4)
    assert not lag2[0]
    assert sorted(st2[0].tolist()) == [1, 2, 3, 4, 5, 6]


def test_refresh_batch_rows_independent():
    prev = np.array([[1, 2, 3, 4], [5, 6, 7, 8]])
    new = np.array([[1, 2, 3, 9], [5, 6, 7, 8]])
    st, nt, ns, adm, lag = refresh_np(prev, new, pad=2)
    assert not lag.any()
    assert st[1].tolist() == [5, 6, 7, 8]
    assert 9 in st[0].tolist() and 4 not in st[0].tolist()


# ------------------------------------------------- engine-level parity


def run_engine(recon: str, prompt_len=700, n_out=40, seed=3):
    from sparsevllm_tpu.engine.llm_engine import LLMEngine
    from sparsevllm_tpu.models.spec import ModelSpec
    from sparsevllm_tpu.models.weights import init_params
    from sparsevllm_tpu.sampling_params import SamplingParams

    spec = ModelSpec(
        model_type="llama", num_layers=4, hidden_size=64, num_q_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=128,
        vocab_size=256, rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=4096, tie_word_embeddings=True,
    )
    params = init_params(spec, seed=seed, dtype="float32")
    eng = LLMEngine(
        spec=spec, params=params, method="deltakv", dtype="float32",
        page_size=8, num_kv_pages=640, max_model_len=2048,
        chunk_prefill_size=128, max_num_batched_tokens=512,
        max_decoding_seqs=2, max_num_seqs_in_batch=2,
        decode_context_bucket_base=64, decode_steps_per_dispatch=4,
        full_attn_layers=(0, 2), decode_keep_tokens=64,
        deltakv_cluster_ratio=1.0 / 8,
        deltakv_max_compressed_tokens=1024,
        deltakv_recompress_interval=64,
        deltakv_recon_cache=recon,
        deltakv_recon_pad=16,
        sink_keep_tokens=16, recent_keep_tokens=32,
    )
    rng = np.random.default_rng(seed)
    ids = rng.integers(5, 250, size=prompt_len).tolist()
    eng.add_request(prompt_token_ids=ids, sampling_params=SamplingParams(
        temperature=0.0, ignore_eos=True, max_tokens=n_out))
    out = []
    while eng.scheduler.has_work:
        for seq, toks in eng.step():
            out.extend(toks)
    eng.exit()
    return out


@pytest.mark.slow
def test_recon_cache_token_parity_e2e():
    base = run_engine("off")
    cached = run_engine("on")
    assert len(base) >= 30
    assert base == cached


@pytest.mark.slow
def test_recon_cache_on_flag_actually_engages():
    from sparsevllm_tpu.engine.llm_engine import LLMEngine
    from sparsevllm_tpu.models.spec import ModelSpec
    from sparsevllm_tpu.models.weights import init_params

    spec = ModelSpec(
        model_type="llama", num_layers=4, hidden_size=64, num_q_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=128,
        vocab_size=256, rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=4096, tie_word_embeddings=True,
    )
    params = init_params(spec, seed=0, dtype="float32")
    eng = LLMEngine(
        spec=spec, params=params, method="deltakv", dtype="float32",
        page_size=8, num_kv_pages=640, max_model_len=2048,
        chunk_prefill_size=128, max_num_batched_tokens=512,
        max_decoding_seqs=2, max_num_seqs_in_batch=2,
        decode_context_bucket_base=64, decode_steps_per_dispatch=4,
        full_attn_layers=(0, 2), decode_keep_tokens=64,
        deltakv_recon_cache="on", deltakv_max_compressed_tokens=1024,
        sink_keep_tokens=16, recent_keep_tokens=32,
    )
    ex = eng.executor
    assert ex.dk_recon is not None
    assert ex._rt.dk_recon is True
    assert ex.dk_recon["kv"].shape[2] == 64  # decode_keep_tokens
    assert ex.dk_recon["slot_tok"].shape[0] == 2  # two selection groups
    eng.exit()
