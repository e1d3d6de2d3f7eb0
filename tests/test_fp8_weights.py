"""Block-scaled FP8 weight storage (ops/fp8.py).

Mirrors the reference's fine-grained FP8 linear backend contract
(quantization/fp8.py:58-129): (128,128) blocks, e4m3 payload, float32
weight_scale_inv, dequantize-by-multiply. Plus engine E2E: an fp8-stored
tiny-random model must stay close to its bf16 twin.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sparsevllm_tpu.ops import fp8 as fp8_ops


def test_quantize_shapes_and_padding():
    w = jnp.asarray(np.random.default_rng(0).standard_normal((4, 200, 300)),
                    jnp.float32)
    w8, sinv = fp8_ops.quantize(w)
    assert w8.shape == (4, 256, 384) and w8.dtype == jnp.float8_e4m3fn
    assert sinv.shape == (4, 2, 3) and sinv.dtype == jnp.float32


def test_roundtrip_error_bounded():
    rng = np.random.default_rng(1)
    # per-block varying magnitude exercises the block scales
    w = rng.standard_normal((256, 256)).astype(np.float32)
    w[:128, :128] *= 100.0
    w[128:, 128:] *= 0.01
    w8, sinv = fp8_ops.quantize(jnp.asarray(w))
    back = np.asarray(fp8_ops.dequant(w8, sinv, (256, 256), jnp.float32))
    # e4m3 has a ~2^-3 relative mantissa step; block scaling must keep the
    # relative error uniform across magnitude regimes
    for sl in (np.s_[:128, :128], np.s_[128:, 128:], np.s_[:128, 128:]):
        denom = np.maximum(np.abs(w[sl]), 1e-9)
        rel = np.abs(back[sl] - w[sl]) / denom
        assert rel.mean() < 0.04, (sl, rel.mean())


def test_quantize_param_tree_and_layer_dict():
    rng = np.random.default_rng(2)
    layers = {
        "wq": jnp.asarray(rng.standard_normal((2, 64, 128)), jnp.float32),
        "input_norm": jnp.ones((2, 64)),
    }
    qt, shapes = fp8_ops.quantize_param_tree(layers, ("wq",))
    assert qt["wq"].dtype == jnp.float8_e4m3fn
    assert "wq_sinv" in qt and shapes["wq"] == (64, 128)
    assert qt["input_norm"] is layers["input_norm"]

    lp = {k: v[0] for k, v in qt.items()}
    out = fp8_ops.dequant_layer_dict(lp, {"wq": (64, 128)}, jnp.float32)
    assert out["wq"].shape == (64, 128)
    assert "wq_sinv" not in out
    np.testing.assert_allclose(
        np.asarray(out["wq"]),
        np.asarray(fp8_ops.dequant(qt["wq"][0], qt["wq_sinv"][0], (64, 128),
                                   jnp.float32)),
    )


def make_engine(**overrides):
    from sparsevllm_tpu.engine.llm_engine import LLM

    kwargs = dict(
        tiny_random=True,
        tiny_random_seed=0,
        dtype="float32",
        page_size=8,
        num_kv_pages=256,
        max_model_len=512,
        chunk_prefill_size=64,
        max_num_batched_tokens=256,
        max_num_seqs_in_batch=4,
        max_decoding_seqs=8,
        decode_context_bucket_base=64,
    )
    kwargs.update(overrides)
    return LLM(**kwargs)


def test_engine_fp8_close_to_bf16_reference():
    from sparsevllm_tpu import SamplingParams

    prompt = list(np.random.default_rng(7).integers(3, 250, size=24))
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    base = make_engine()
    ref = base.generate(prompt_token_ids=[[int(t) for t in prompt]],
                        sampling_params=sp)[0].output_token_ids
    base.exit()

    q = make_engine(weight_quantization="fp8")
    got = q.generate(prompt_token_ids=[[int(t) for t in prompt]],
                     sampling_params=sp)[0].output_token_ids
    q.exit()
    # random-weight tiny model: logit margins are tiny, so token-for-token
    # agreement is not guaranteed — but the FIRST token comes from a real
    # forward over the prompt and must agree for a faithful quantization
    assert got[0] == ref[0]
    assert len(got) == len(ref)


def test_config_rejects_unknown_weight_quantization():
    with pytest.raises(ValueError, match="weight_quantization"):
        make_engine(weight_quantization="int3")


def test_hybrid_engine_fp8_runs():
    """Hybrid (qwen3_next) path with fp8 weight storage: prefill + decode
    must run and the first greedy token must match the bf16-stored twin."""
    from sparsevllm_tpu import SamplingParams
    from sparsevllm_tpu.engine.llm_engine import LLM

    hybrid_cfg = {
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
    base = dict(
        tiny_random=True, tiny_random_seed=0,
        tiny_random_config=hybrid_cfg,
        dtype="float32", page_size=8, num_kv_pages=128,
        max_model_len=256, chunk_prefill_size=32,
        max_num_batched_tokens=128, max_num_seqs_in_batch=2,
        max_decoding_seqs=4, decode_context_bucket_base=64,
        decode_steps_per_dispatch=2,
    )
    prompt = [int(t) for t in
              np.random.default_rng(3).integers(3, 250, size=20)]
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)

    eng = LLM(**base)
    ref = eng.generate(prompt_token_ids=[prompt],
                       sampling_params=sp)[0].output_token_ids
    eng.exit()

    eng = LLM(weight_quantization="fp8", **base)
    got = eng.generate(prompt_token_ids=[prompt],
                       sampling_params=sp)[0].output_token_ids
    eng.exit()
    assert got[0] == ref[0]
    assert len(got) == len(ref)


def test_load_prequantized_fp8_checkpoint(tmp_path):
    """Synthesized Qwen3.5-style fp8 checkpoint (e4m3 payload +
    weight_scale_inv, quantization_config.quant_method='fp8') loads and
    dequantizes to the expected values."""
    import json as _json

    import torch
    from safetensors.torch import save_file

    from sparsevllm_tpu.models.spec import ModelSpec
    from sparsevllm_tpu.models.weights import load_hf_weights

    spec = ModelSpec(
        model_type="llama", num_layers=1, hidden_size=8, num_q_heads=2,
        num_kv_heads=2, head_dim=4, intermediate_size=16, vocab_size=32,
        rms_norm_eps=1e-5, rope_theta=1e4, max_position_embeddings=64,
        tie_word_embeddings=True,
    )
    g = torch.Generator().manual_seed(0)
    tensors = {}
    expected = {}

    def add_fp8(name, o, i):
        w = torch.randn(o, i, generator=g)
        # one scale block covering the whole (tiny) weight
        amax = w.abs().amax().clamp(min=1e-12)
        sinv = (amax / 448.0).reshape(1, 1)
        w8 = (w / sinv).to(torch.float8_e4m3fn)
        tensors[name + ".weight"] = w8
        tensors[name + ".weight_scale_inv"] = sinv
        expected[name] = (w8.float() * sinv).numpy()

    def add_plain(name, *shape):
        tensors[name + ".weight"] = torch.randn(*shape, generator=g)

    pre = "model.layers.0"
    for proj, o, i in (
        ("q_proj", 8, 8), ("k_proj", 8, 8), ("v_proj", 8, 8),
        ("o_proj", 8, 8),
    ):
        add_fp8(f"{pre}.self_attn.{proj}", o, i)
    for proj, o, i in (
        ("gate_proj", 16, 8), ("up_proj", 16, 8), ("down_proj", 8, 16),
    ):
        add_fp8(f"{pre}.mlp.{proj}", o, i)
    add_plain(f"{pre}.input_layernorm", 8)
    add_plain(f"{pre}.post_attention_layernorm", 8)
    add_plain("model.embed_tokens", 32, 8)
    add_plain("model.norm", 8)

    save_file(tensors, str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(_json.dumps({
        "model_type": "llama",
        "quantization_config": {"quant_method": "fp8",
                                "weight_block_size": [128, 128]},
    }))

    params = load_hf_weights(spec, str(tmp_path), "float32")
    got_wq = np.asarray(params["layers"]["wq"][0])
    np.testing.assert_allclose(
        got_wq, expected[f"{pre}.self_attn.q_proj"].T, rtol=1e-6
    )
    got_down = np.asarray(params["layers"]["w_down"][0])
    np.testing.assert_allclose(
        got_down, expected[f"{pre}.mlp.down_proj"].T, rtol=1e-6
    )
