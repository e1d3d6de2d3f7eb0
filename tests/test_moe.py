"""Qwen3-MoE: engine-vs-HF parity + expert-parallel sharding dry run.

Mirrors reference tests (test_triton_moe.py + qwen3_moe compat matrix,
method_registry.py:59-204): routing math and packed-expert FFN verified
against the HF implementation via the tiny-random ladder; EP sharding
validated on the virtual device mesh (experts over the 'model' axis).
"""

import jax
import numpy as np
import pytest
import torch

from sparsevllm_tpu import SamplingParams
from sparsevllm_tpu.engine.llm_engine import LLM
from sparsevllm_tpu.utils.tiny_random import build_tiny_hf_model, tiny_config

SEED = 0

MOE_CFG = {
    "model_type": "qwen3_moe",
    "hidden_size": 64,
    "intermediate_size": 128,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 16,
    "vocab_size": 512,
    "num_experts": 8,
    "num_experts_per_tok": 2,
    "moe_intermediate_size": 32,
}

BASE = dict(
    tiny_random=True,
    tiny_random_seed=SEED,
    tiny_random_config=MOE_CFG,
    dtype="float32",
    page_size=8,
    num_kv_pages=256,
    max_model_len=512,
    chunk_prefill_size=64,
    max_num_batched_tokens=256,
    max_num_seqs_in_batch=4,
    max_decoding_seqs=8,
    decode_context_bucket_base=64,
    decode_steps_per_dispatch=4,
)


@pytest.fixture(scope="module")
def hf_moe():
    cfg = tiny_config(MOE_CFG)
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


def test_moe_dense_parity(hf_moe):
    cfg, model = hf_moe
    engine = LLM(**BASE)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(3, 500, n).tolist() for n in (40, 90)]
    outs = engine.generate(
        prompt_token_ids=prompts,
        sampling_params=SamplingParams(temperature=0.0, max_tokens=6),
    )
    for p, o in zip(prompts, outs):
        assert o.output_token_ids == hf_greedy(model, p, 6)


def test_moe_with_sparse_method(hf_moe):
    """MoE + streamingllm (reference compat matrix allows eviction methods)."""
    cfg, model = hf_moe
    engine = LLM(
        sparse_method="streamingllm",
        sink_keep_tokens=8, recent_keep_tokens=64,
        **BASE,
    )
    rng = np.random.default_rng(4)
    prompt = rng.integers(3, 500, 60).tolist()
    outs = engine.generate(
        prompt_token_ids=[prompt],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=6),
    )
    assert outs[0].output_token_ids == hf_greedy(model, prompt, 6)


def test_moe_ep_sharded_mesh():
    """Expert-parallel sorted dispatch (shard_map + local-range
    ragged_dot) on the 8-device mesh is token-identical to the
    single-device engine."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(5)
    prompts = [rng.integers(3, 500, 24).tolist() for _ in range(4)]
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    engine = LLM(tensor_parallel_size=4, data_parallel_size=2, **BASE)
    assert engine.executor._rt.moe_dispatch == "sorted_ep"
    outs = engine.generate(prompt_token_ids=prompts, sampling_params=sp)
    # experts really sharded: 8 experts / model axis 4 = 2 per device
    shard = engine.executor.params["layers"]["moe_w_gate"].sharding
    assert "model" in str(shard.spec)
    engine.exit()
    single = LLM(**BASE)
    souts = single.generate(prompt_token_ids=prompts, sampling_params=sp)
    assert [o.output_token_ids for o in outs] == \
        [o.output_token_ids for o in souts]


def test_moe_sorted_ep_matches_dense_block():
    """_moe_sorted_ep (shard_map local-expert ragged_dot + psum) ==
    dense-over-experts einsum, bitwise-closely, on a (2, 4) mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp

    from sparsevllm_tpu.models import transformer as tfm
    from sparsevllm_tpu.models.spec import ModelSpec
    from sparsevllm_tpu.parallel.mesh import build_mesh, set_current_mesh

    spec = ModelSpec(
        model_type="qwen3_moe", num_layers=1, hidden_size=32,
        num_q_heads=4, num_kv_heads=2, head_dim=8, intermediate_size=64,
        vocab_size=128, rms_norm_eps=1e-6, rope_theta=1e4,
        max_position_embeddings=512, num_experts=8, num_experts_per_tok=2,
        moe_intermediate_size=16,
    )
    rng = np.random.default_rng(0)
    lp = {
        "router": jnp.asarray(rng.normal(size=(32, 8)), jnp.float32),
        "moe_w_gate": jnp.asarray(rng.normal(size=(8, 32, 16)) * 0.1,
                                  jnp.float32),
        "moe_w_up": jnp.asarray(rng.normal(size=(8, 32, 16)) * 0.1,
                                jnp.float32),
        "moe_w_down": jnp.asarray(rng.normal(size=(8, 16, 32)) * 0.1,
                                  jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(2, 4, 32)), jnp.float32)  # t=8 | dp
    mesh = build_mesh(tp=4, dp=2)
    set_current_mesh(mesh)
    try:
        dense = tfm._moe(x, lp, spec)
        ep = jax.jit(lambda x, lp: tfm._moe_sorted_ep(x, lp, spec))(x, lp)
    finally:
        set_current_mesh(None)
    np.testing.assert_allclose(np.asarray(ep), np.asarray(dense), atol=1e-5)


def test_moe_sorted_matches_dense_dispatch():
    """ragged-dot sorted dispatch == dense-over-experts einsum."""
    import jax.numpy as jnp
    import numpy as np

    from sparsevllm_tpu.models import transformer as tfm
    from sparsevllm_tpu.models.spec import ModelSpec

    spec = ModelSpec(
        model_type="qwen3_moe", num_layers=1, hidden_size=32,
        num_q_heads=4, num_kv_heads=2, head_dim=8, intermediate_size=64,
        vocab_size=128, rms_norm_eps=1e-6, rope_theta=1e4,
        max_position_embeddings=512, num_experts=8, num_experts_per_tok=2,
        moe_intermediate_size=16,
    )
    rng = np.random.default_rng(0)
    lp = {
        "router": jnp.asarray(rng.normal(size=(32, 8)), jnp.float32),
        "moe_w_gate": jnp.asarray(rng.normal(size=(8, 32, 16)) * 0.1,
                                  jnp.float32),
        "moe_w_up": jnp.asarray(rng.normal(size=(8, 32, 16)) * 0.1,
                                jnp.float32),
        "moe_w_down": jnp.asarray(rng.normal(size=(8, 16, 32)) * 0.1,
                                  jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(3, 5, 32)), jnp.float32)
    dense = tfm._moe(x, lp, spec)
    sorted_ = tfm._moe_sorted(x, lp, spec)
    np.testing.assert_allclose(sorted_, dense, atol=1e-5)


def test_moe_independent_ep_degree():
    """INDEPENDENT EP (EP=4, TP=1 — the reference's ep_replicated_kv
    group, method_registry.py:59-79): experts shard over a dedicated
    'expert' mesh axis, KV/attention replicate across it, and tokens are
    identical to the single-device engine."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(6)
    prompts = [rng.integers(3, 500, 24).tolist() for _ in range(4)]
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    engine = LLM(expert_parallel_size=4, data_parallel_size=2, **BASE)
    assert engine.executor.mesh.shape["expert"] == 4
    shard = engine.executor.params["layers"]["moe_w_gate"].sharding
    assert "expert" in str(shard.spec)
    # attention weights replicate over the expert axis
    wq_spec = str(engine.executor.params["layers"]["wq"].sharding.spec)
    assert "expert" not in wq_spec
    outs = engine.generate(prompt_token_ids=prompts, sampling_params=sp)
    engine.exit()
    single = LLM(**BASE)
    souts = single.generate(prompt_token_ids=prompts, sampling_params=sp)
    assert [o.output_token_ids for o in outs] == \
        [o.output_token_ids for o in souts]


def test_independent_ep_requires_tp1():
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="independent"):
        LLM(expert_parallel_size=2, tensor_parallel_size=4, **BASE)
