"""Qwen3-Next hybrid (full + gated-delta-net linear attention) E2E parity.

Mirrors the reference qwen3_5 test surface (models/qwen3_5.py +
recurrent_state_manager.py): chunked prefill must carry conv/recurrent state
across chunks, decode must recur per step, and the whole engine path must
match HF greedy decoding on the tiny-random ladder.
"""

import numpy as np
import pytest
import torch

from sparsevllm_tpu import SamplingParams
from sparsevllm_tpu.engine.llm_engine import LLM
from sparsevllm_tpu.utils.tiny_random import build_tiny_hf_model, tiny_config

SEED = 0

HYBRID_CFG = {
    "model_type": "qwen3_next",
    "hidden_size": 64,
    "intermediate_size": 128,
    "num_hidden_layers": 4,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 16,
    "vocab_size": 512,
    "num_experts": 0,
    "decoder_sparse_step": 0,
    "linear_num_value_heads": 4,
    "linear_num_key_heads": 2,
    "linear_key_head_dim": 16,
    "linear_value_head_dim": 16,
    "linear_conv_kernel_dim": 4,
    "layer_types": ["linear_attention", "full_attention",
                    "linear_attention", "full_attention"],
    "partial_rotary_factor": 0.25,
}

BASE = dict(
    tiny_random=True,
    tiny_random_seed=SEED,
    tiny_random_config=HYBRID_CFG,
    dtype="float32",
    page_size=8,
    num_kv_pages=256,
    max_model_len=512,
    chunk_prefill_size=32,  # forces multi-chunk prefill (state carry-over)
    max_num_batched_tokens=256,
    max_num_seqs_in_batch=4,
    max_decoding_seqs=8,
    decode_context_bucket_base=64,
    decode_steps_per_dispatch=4,
)


@pytest.fixture(scope="module")
def hf_hybrid():
    cfg = tiny_config(HYBRID_CFG)
    _, model = build_tiny_hf_model(cfg, SEED)
    return cfg, model


def hf_greedy(model, prompt_ids, n, eos_ids=(2,)):
    ids = list(prompt_ids)
    out = []
    with torch.no_grad():
        for _ in range(n):
            logits = model(torch.tensor([ids], dtype=torch.long)).logits
            tok = int(logits[0, -1].argmax())
            out.append(tok)
            ids.append(tok)
            if tok in eos_ids:
                break
    return out


def test_hybrid_greedy_parity_multichunk(hf_hybrid):
    """90-token prompt = 3 prefill chunks: conv tail + delta-rule state must
    carry across chunk boundaries exactly."""
    cfg, model = hf_hybrid
    engine = LLM(**BASE)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(3, 500, n).tolist() for n in (25, 90)]
    outs = engine.generate(
        prompt_token_ids=prompts,
        sampling_params=SamplingParams(temperature=0.0, max_tokens=6),
    )
    for p, o in zip(prompts, outs):
        assert o.output_token_ids == hf_greedy(model, p, 6)


def test_hybrid_row_reuse_resets_state(hf_hybrid):
    """A freed row's recurrent state must not leak into the next sequence."""
    cfg, model = hf_hybrid
    engine = LLM(**{**BASE, "max_decoding_seqs": 1,
                    "max_num_seqs_in_batch": 1, "max_num_seqs_in_gpu": 1})
    rng = np.random.default_rng(5)
    p1 = rng.integers(3, 500, 40).tolist()
    p2 = rng.integers(3, 500, 40).tolist()
    o1 = engine.generate(
        prompt_token_ids=[p1],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=4),
    )[0]
    o2 = engine.generate(
        prompt_token_ids=[p2],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=4),
    )[0]
    assert o1.output_token_ids == hf_greedy(model, p1, 4)
    assert o2.output_token_ids == hf_greedy(model, p2, 4)


def test_hybrid_rejects_sparse_methods():
    with pytest.raises(NotImplementedError, match="hybrid"):
        LLM(sparse_method="snapkv", prefill_keep_tokens=64,
            snapkv_obs_window=8, sink_keep_tokens=8, recent_keep_tokens=16,
            **BASE)


def test_hybrid_kv_pools_cover_full_layers_only(hf_hybrid):
    engine = LLM(**BASE)
    assert engine.kv.L == 2  # 2 of 4 layers are full attention
    assert engine.executor.conv_states.shape[0] == 2  # 2 linear layers


def test_hybrid_joint_prefix_cache():
    """Joint KV + recurrent-state prefix blocks (reference
    PrefixCacheCoordinator): a second request sharing a prefix must attach
    cached blocks + restore conv/delta state, and generate exactly what an
    uncached engine generates."""
    import numpy as np

    from sparsevllm_tpu import SamplingParams
    from sparsevllm_tpu.engine.llm_engine import LLMEngine

    kw = dict(
        tiny_random=True, tiny_random_config=HYBRID_CFG,
        dtype="float32", page_size=8, num_kv_pages=256, max_model_len=512,
        chunk_prefill_size=64, max_num_batched_tokens=512,
        max_decoding_seqs=4, max_num_seqs_in_batch=4,
        decode_context_bucket_base=64, decode_steps_per_dispatch=2,
    )
    rng = np.random.default_rng(31)
    prefix = rng.integers(3, 500, 128).tolist()  # 2 page-aligned chunks
    p1 = prefix + rng.integers(3, 500, 30).tolist()
    p2 = prefix + rng.integers(3, 500, 25).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    cached = LLMEngine(enable_prefix_cache=True, **kw)
    (o1,) = cached.generate(prompt_token_ids=[list(p1)],
                            sampling_params=sp)
    sid = cached.add_request(prompt_token_ids=list(p2), sampling_params=sp)
    while cached.scheduler.has_work:
        cached.step()
    seq2 = cached._seqs[sid]
    hits = cached.prefix_cache.stats()
    assert hits.get("hit_tokens", 0) >= 128 or hits.get("hits", 0) >= 1, hits

    plain = LLMEngine(**kw)
    outs = plain.generate(prompt_token_ids=[list(p1), list(p2)],
                          sampling_params=sp)
    assert o1.output_token_ids == outs[0].output_token_ids
    assert seq2.completion_token_ids == outs[1].output_token_ids


# ------------------------------------------------------- hybrid x deltakv


def _hybrid_identity_ckpt(tmp_path):
    """Identity linear compressor for the ONE sparse KV slot (layer 3):
    io = 2 * num_kv_heads * head_dim = 64."""
    import os

    import jax.numpy as jnp

    from sparsevllm_tpu.utils import compressor as comp_ops

    io = 2 * HYBRID_CFG["num_key_value_heads"] * HYBRID_CFG["head_dim"]
    eye = np.eye(io, dtype=np.float32)[None]
    comp = {
        "arch": "linear",
        "down": {"w1": jnp.asarray(eye)},
        "up": {"w1": jnp.asarray(eye)},
    }
    path = os.path.join(tmp_path, "dk_hybrid_identity.npz")
    comp_ops.save_checkpoint(path, comp, {"note": "identity"})
    return path


def test_hybrid_deltakv_lossless_equals_dense(tmp_path, hf_hybrid):
    """hybrid x deltakv (VERDICT r3 missing #3): the model's full-attention
    layers split into observation (layer 1 -> KV slot 0) and
    deltakv-compressed (layer 3 -> KV slot 1); linear layers keep their
    recurrent state untouched. cluster_ratio=1 + identity compressor makes
    the whole pipeline (partial De-RoPE -> centers -> latents ->
    reconstruct -> partial Re-RoPE -> sparse attention) exact, so hybrid
    deltakv must match HF greedy. Ref: models/qwen3_5.py:399-857 pairing."""
    cfg, model = hf_hybrid
    engine = LLM(
        sparse_method="deltakv",
        full_attention_layers=(1,),
        deltakv_checkpoint_path=_hybrid_identity_ckpt(tmp_path),
        deltakv_cluster_ratio=1.0,
        deltakv_max_compressed_tokens=256,
        decode_keep_tokens=256,
        sink_keep_tokens=8, recent_keep_tokens=16,
        **BASE,
    )
    rng = np.random.default_rng(7)
    prompts = [rng.integers(3, 500, n).tolist() for n in (60, 150)]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    sids = [engine.add_request(prompt_token_ids=list(p), sampling_params=sp)
            for p in prompts]
    compressed = False
    while engine.scheduler.has_work:
        engine.step()
        compressed = compressed or any(
            engine.kv.comp_counts.get(s, 0) > 0 for s in sids
        )
    assert compressed, "prefill-end compression never fired"
    for p, sid in zip(prompts, sids):
        toks = engine._seqs[sid].completion_token_ids
        # tol matches test_deltakv.assert_hf_consistent: near-tie argmax
        # flips on the random tiny model are float-order noise
        ids = list(p)
        with torch.no_grad():
            for t in toks:
                logits = model(
                    torch.tensor([ids], dtype=torch.long)
                ).logits[0, -1]
                gap = float(logits.max() - logits[t])
                assert gap <= 0.02, (
                    f"engine token {t} is {gap:.4f} below HF max"
                )
                ids.append(t)


def test_hybrid_deltakv_requires_first_full_layer():
    with pytest.raises(ValueError, match="(?i)first full-attention layer"):
        LLM(
            sparse_method="deltakv",
            full_attention_layers=(3,),  # layer 1 (first full) missing
            deltakv_cluster_ratio=1.0,
            deltakv_max_compressed_tokens=256,
            decode_keep_tokens=256,
            sink_keep_tokens=8, recent_keep_tokens=16,
            **BASE,
        )


def test_hybrid_deltakv_rejects_non_full_layer():
    with pytest.raises(ValueError, match="not .*full-attention"):
        LLM(
            sparse_method="deltakv",
            full_attention_layers=(0, 1),  # layer 0 is linear attention
            deltakv_cluster_ratio=1.0,
            deltakv_max_compressed_tokens=256,
            decode_keep_tokens=256,
            sink_keep_tokens=8, recent_keep_tokens=16,
            **BASE,
        )
