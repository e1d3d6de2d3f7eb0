"""HF-side toolkit: generate API + token-selection oracle vs the engine.

Mirrors the reference's engine-vs-HF accuracy anchoring
(src/deltakv/get_chat_api.py + modeling/cache_pipeline.py): the HF
backend is an independent torch implementation of the sparse methods;
the engine must agree with it."""

import numpy as np
import pytest

from sparsevllm_tpu.hf import get_generate_api

ENGINE_KW = dict(
    dtype="float32",
    page_size=8,
    num_kv_pages=256,
    max_model_len=512,
    chunk_prefill_size=64,
    max_num_batched_tokens=512,
    max_decoding_seqs=4,
    max_num_seqs_in_batch=4,
    decode_context_bucket_base=64,
    decode_steps_per_dispatch=2,
)


@pytest.fixture(scope="module")
def prompt():
    return np.random.default_rng(17).integers(3, 500, 150).tolist()


def test_hf_dense_matches_engine(prompt):
    eng = get_generate_api(backend="engine", tiny_random=True, **ENGINE_KW)
    hf = get_generate_api(backend="hf", tiny_random=True)
    assert eng(prompt, 8) == hf(prompt, 8)


def test_hf_chunked_prefill_matches_full(prompt):
    hf = get_generate_api(backend="hf", tiny_random=True)
    hf_chunked = get_generate_api(backend="hf", tiny_random=True,
                                  chunk_prefill_size=64)
    assert hf(prompt, 6) == hf_chunked(prompt, 6)


def test_hf_snapkv_oracle_matches_engine(prompt):
    """Independent torch SnapKV (eager attention scores + top-k gather)
    vs the engine's in-scan scoring + compaction: same keep budgets must
    give the same greedy continuation."""
    cfg = dict(prefill_keep_tokens=64, snapkv_obs_window=16,
               snapkv_kernel_size=5, sink_keep_tokens=8,
               recent_keep_tokens=16)
    eng = get_generate_api(backend="engine", tiny_random=True,
                           method="snapkv", **cfg, **ENGINE_KW)
    hf = get_generate_api(backend="hf", tiny_random=True, method="snapkv",
                          **cfg)
    etoks = eng(prompt, 8)
    htoks = hf(prompt, 8)
    assert etoks == htoks, (etoks, htoks)


def test_hf_deltakv_all_full_matches_dense(prompt):
    """The manual deltakv drive loop with EVERY layer full (dense raw
    cache, no compression anywhere) must reproduce HF's own forward —
    validates the loop's rope/attention/mlp math independently of the
    cluster cache."""
    hf_dense = get_generate_api(backend="hf", tiny_random=True)
    hf_dk = get_generate_api(
        backend="hf", tiny_random=True, method="deltakv",
        full_attn_layers=tuple(range(4)),  # tiny-random llama has 4 layers
        num_sink_tokens=8, num_recent_tokens=16, decode_keep_tokens=64,
        deltakv_cluster_ratio=0.25,
    )
    assert hf_dk(prompt, 8) == hf_dense(prompt, 8)


def test_hf_deltakv_origin_lossless_matches_dense(prompt):
    """Origin codec (payload = exact K||V - ref residual, fp payload) with
    topk >= compressed count reconstructs the cache exactly: greedy
    continuation must equal dense HF. Anchors ClusterKVCache's
    centers/fathers/reconstruct math (reference cache_pipeline.py
    ClusterCachePipeline) to HF's own forward; the engine-side mirror is
    tests/test_deltakv.py lossless-vs-dense."""
    hf_dense = get_generate_api(backend="hf", tiny_random=True)
    hf_dk = get_generate_api(
        backend="hf", tiny_random=True, method="deltakv",
        full_attn_layers=(0,),
        num_sink_tokens=8, num_recent_tokens=16, decode_keep_tokens=512,
        deltakv_cluster_ratio=0.25, chunk_prefill_size=32,
    )
    assert hf_dk(prompt, 8) == hf_dense(prompt, 8)


def test_omnikv_token_select_math():
    import torch

    from sparsevllm_tpu.hf.token_select import omnikv_token_selection

    attn = torch.zeros(1, 2, 1, 32)
    attn[0, :, 0, 20] = 5.0  # hottest middle token
    attn[0, :, 0, 10] = 3.0
    sel = omnikv_token_selection(attn, keep=2, sink=4, recent=4, ctx_len=32)
    assert sel[0, :4].all()  # sink
    assert sel[0, 28:].all()  # recent
    assert sel[0, 20] and sel[0, 10]
    assert sel[0].sum() == 4 + 4 + 2
