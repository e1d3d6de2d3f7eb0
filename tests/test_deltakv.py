"""DeltaKV: compressor math, compression pipeline, E2E vs dense.

Keystone test (mirrors the reference's kernel-vs-eager + HF-parity ladder,
tests/test_deltakv_less_memory_kernel.py + compare_logits_hf_sparsevllm):
with cluster_ratio=1.0 every token is its own center, so residuals are
exactly zero, INT4 quantization is exact, and the full pipeline
(De-RoPE -> center store -> latent -> reconstruct -> Re-RoPE -> sparse
attention) must reproduce dense greedy decoding BIT-FOR-BIT at the argmax
level. That validates every moving part except the learned compressor, which
test_compressor_roundtrip covers separately.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sparsevllm_tpu import SamplingParams
from sparsevllm_tpu.engine.llm_engine import LLM
from sparsevllm_tpu.utils import compressor as comp_ops
from sparsevllm_tpu.utils.tiny_random import build_tiny_hf_model, tiny_config

SEED = 0


@pytest.fixture(scope="module")
def hf_model():
    cfg = tiny_config(None)
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


def assert_hf_consistent(model, prompt_ids, engine_tokens, tol=0.02):
    """Teacher-force the ENGINE's tokens through HF: each must be within
    ``tol`` of HF's max logit (argmax up to near-ties — float reduction
    order flips sub-0.01 gaps on the random tiny model; the reference's
    parity gate is p99 logit diff, not exact argmax)."""
    ids = list(prompt_ids)
    with torch.no_grad():
        for t in engine_tokens:
            logits = model(torch.tensor([ids], dtype=torch.long)).logits
            row = logits[0, -1]
            gap = float(row.max() - row[t])
            assert gap <= tol, (
                f"engine token {t} is {gap:.4f} below HF max "
                f"(argmax {int(row.argmax())})"
            )
            ids.append(t)


BASE = dict(
    tiny_random=True,
    tiny_random_seed=SEED,
    dtype="float32",
    page_size=8,
    num_kv_pages=512,
    max_model_len=512,
    chunk_prefill_size=64,
    max_num_batched_tokens=256,
    max_num_seqs_in_batch=4,
    max_decoding_seqs=8,
    decode_context_bucket_base=64,
    decode_steps_per_dispatch=4,
)

IO_DIM = 2 * 2 * 16  # 2 * num_kv_heads * head_dim of the tiny model


def _identity_ckpt(tmp_path):
    """Linear compressor with identity down/up: lossless latents."""
    ls = 1  # tiny model: 2 layers, layer 0 full -> 1 sparse layer
    eye = np.eye(IO_DIM, dtype=np.float32)[None].repeat(ls, 0)
    comp = {
        "arch": "linear",
        "down": {"w1": jnp.asarray(eye)},
        "up": {"w1": jnp.asarray(eye)},
    }
    path = os.path.join(tmp_path, "dk_identity.npz")
    comp_ops.save_checkpoint(path, comp, {"note": "identity"})
    return path


def test_compressor_roundtrip():
    comp = comp_ops.init_compressor_params(3, IO_DIM, 16, "mlp_gelu", seed=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, IO_DIM)), jnp.float32)
    layer = comp_ops.layer_slice(comp, 1)
    lat = comp_ops.compress_down(layer["down"], "mlp_gelu", x)
    assert lat.shape == (5, 16)
    back = comp_ops.reconstruct_up(layer["up"], "mlp_gelu", lat)
    assert back.shape == (5, IO_DIM)


def test_checkpoint_roundtrip(tmp_path):
    comp = comp_ops.init_compressor_params(2, IO_DIM, 12, "linear", seed=2)
    path = os.path.join(tmp_path, "c.npz")
    comp_ops.save_checkpoint(path, comp, {"kind": "test"})
    loaded, meta = comp_ops.load_checkpoint(path)
    assert meta["latent_dim"] == 12
    assert meta["arch"] == "linear"
    np.testing.assert_allclose(loaded["down"]["w1"], comp["down"]["w1"])


def test_derope_inverts_rope():
    from sparsevllm_tpu.layers.rope import apply_rope, rope_table
    from sparsevllm_tpu.ops.deltakv import derope

    cos, sin = rope_table(16, 512, 10000.0, None)
    rng = np.random.default_rng(3)
    k = jnp.asarray(rng.normal(size=(2, 7, 2, 16)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, 500, size=(2, 7)), jnp.int32)
    roped = apply_rope(k, pos, cos, sin)
    back = derope(roped, pos, cos, sin)
    np.testing.assert_allclose(back, k, atol=1e-5)


def test_deltakv_lossless_equals_dense(tmp_path, hf_model):
    """cluster_ratio=1 + identity compressor: zero residuals -> exact."""
    cfg, model = hf_model
    engine = LLM(
        sparse_method="deltakv",
        full_attention_layers=(0,),
        deltakv_checkpoint_path=_identity_ckpt(tmp_path),
        deltakv_cluster_ratio=1.0,
        deltakv_max_compressed_tokens=256,
        decode_keep_tokens=256,
        sink_keep_tokens=8, recent_keep_tokens=16,
        **BASE,
    )
    prompts_rng = np.random.default_rng(3)
    prompts = [
        prompts_rng.integers(3, cfg["vocab_size"], n).tolist()
        for n in (60, 150)
    ]
    outs = engine.generate(
        prompt_token_ids=prompts,
        sampling_params=SamplingParams(temperature=0.0, max_tokens=6),
    )
    for p, o in zip(prompts, outs):
        assert_hf_consistent(model, p, o.output_token_ids)
    # the middle region must actually have been compressed + freed
    assert engine.kv.comp_counts == {}  # finished seqs cleaned up


def test_deltakv_prefill_after_splice_page_reuse(tmp_path, hf_model):
    """REGRESSION: per-layer page stacks diverge after a deltakv splice
    (sparse layers free pages full layers keep). The prefill path used to
    store EVERY layer at layer-0's slot ids, so a second sequence whose
    sparse-layer pages were reused from the spliced set kept the FIRST
    sequence's stale KV (measured: recall 0.08 vs 1.00 on the induction
    oracle, centers holding another row's tokens). Force the interleave:
    seq A compresses + splices first, then seq B's prefill must allocate
    A's freed sparse-layer pages and still match HF."""
    cfg, model = hf_model
    engine = LLM(
        sparse_method="deltakv",
        full_attention_layers=(0,),
        deltakv_checkpoint_path=_identity_ckpt(tmp_path),
        deltakv_cluster_ratio=1.0,
        deltakv_max_compressed_tokens=256,
        decode_keep_tokens=256,
        sink_keep_tokens=8, recent_keep_tokens=16,
        **{**BASE, "num_kv_pages": 64},  # small pool -> reuse guaranteed
    )
    rng = np.random.default_rng(11)
    prompt_a = rng.integers(3, cfg["vocab_size"], 120).tolist()
    prompt_b = rng.integers(3, cfg["vocab_size"], 120).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=32, ignore_eos=True)
    sid_a = engine.add_request(prompt_token_ids=prompt_a, sampling_params=sp)
    # run until A has compressed (splice freed its sparse-layer pages)
    for _ in range(200):
        engine.step()
        if engine.kv.comp_counts.get(sid_a, 0) > 0:
            break
    assert engine.kv.comp_counts.get(sid_a, 0) > 0
    # B prefills now; its sparse-layer pages reuse A's freed ones
    sid_b = engine.add_request(prompt_token_ids=prompt_b, sampling_params=sp)
    b_seq = engine._seqs[sid_b]
    while engine.scheduler.has_work:
        engine.step()
    # the victim is B: its sparse-layer KV must be its own
    assert_hf_consistent(model, prompt_b, b_seq.completion_token_ids)


def test_deltakv_compression_frees_pages(tmp_path, hf_model):
    cfg, _ = hf_model
    engine = LLM(
        sparse_method="deltakv",
        full_attention_layers=(0,),
        deltakv_checkpoint_path=_identity_ckpt(tmp_path),
        deltakv_cluster_ratio=1.0,
        deltakv_max_compressed_tokens=256,
        decode_keep_tokens=32,
        sink_keep_tokens=8, recent_keep_tokens=16,
        **BASE,
    )
    prompt = np.random.default_rng(5).integers(3, 500, 200).tolist()
    sid = engine.add_request(
        prompt_token_ids=prompt,
        sampling_params=SamplingParams(temperature=0.0, max_tokens=4,
                                       ignore_eos=True),
    )
    seq = engine._seqs[sid]
    while not seq.prefill_done:
        engine.step()
    row = engine.kv.seq_rows[sid]
    sparse_l = engine.kv.sparse_layers[0]
    full_l = engine.kv.full_layers[0]
    comp = engine.kv.comp_counts[sid]
    assert comp > 0 and comp % 8 == 0
    # sparse layer row shrank by the compressed count; full layer intact
    assert engine.kv.row_lens[sparse_l, row] == 200 - comp
    assert engine.kv.row_lens[full_l, row] == 200
    while engine.scheduler.has_work:
        engine.step()
    assert len(seq.completion_token_ids) == 4


def test_deltakv_random_compressor_runs(hf_model):
    """No checkpoint: loud warning, pipeline still runs (tight budget)."""
    cfg, _ = hf_model
    engine = LLM(
        sparse_method="deltakv",
        full_attention_layers=(0,),
        deltakv_cluster_ratio=0.25,
        deltakv_max_compressed_tokens=256,
        decode_keep_tokens=16,
        sink_keep_tokens=8, recent_keep_tokens=16,
        **BASE,
    )
    prompt = np.random.default_rng(6).integers(3, 500, 150).tolist()
    outs = engine.generate(
        prompt_token_ids=[prompt],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=6,
                                       ignore_eos=True),
    )
    assert len(outs[0].output_token_ids) == 6


def test_compressor_training_learns_and_deploys(tmp_path, hf_model):
    """PCA-init beats random init; QAT refinement holds it; ckpt runs E2E."""
    from sparsevllm_tpu.deltakv import (
        collect_kv_residuals, train_compressors,
    )
    from sparsevllm_tpu.utils.compressor import init_compressor_params
    from sparsevllm_tpu.utils.tiny_random import build_tiny_params_and_spec

    params, spec = build_tiny_params_and_spec(None, SEED, "float32")
    rng = np.random.default_rng(1)
    prompts = [rng.integers(3, 512, 96).tolist() for _ in range(3)]
    res = collect_kv_residuals(params, spec, prompts, [1], stride=4)
    assert res.shape[1:] == (1, IO_DIM)
    comp, losses = train_compressors(res, 16, "linear", steps=60, seed=0)
    # PCA init starts near the linear-codec optimum: SGD under int4 QAT
    # must not degrade it (it cannot meaningfully improve it)
    assert losses[-1] < losses[0] * 1.25, (losses[0], losses[-1])
    # and the PCA start itself must crush a random-init start
    rand = init_compressor_params(1, IO_DIM, 16, "linear", seed=0)
    x = jnp.asarray(res[:, 0], jnp.float32)
    rec = comp_ops._apply(
        {"w1": rand["up"]["w1"][0]},
        comp_ops._apply({"w1": rand["down"]["w1"][0]}, x, "linear"),
        "linear",
    )
    rand_loss = float(jnp.mean((rec - x) ** 2))
    assert losses[0] < rand_loss * 0.5, (losses[0], rand_loss)
    path = os.path.join(tmp_path, "trained.npz")
    comp_ops.save_checkpoint(path, comp, {"stride": 4})

    engine = LLM(
        sparse_method="deltakv",
        full_attention_layers=(0,),
        deltakv_checkpoint_path=path,
        deltakv_cluster_ratio=0.25,
        deltakv_max_compressed_tokens=256,
        decode_keep_tokens=64,
        sink_keep_tokens=8, recent_keep_tokens=16,
        **BASE,
    )
    prompt = rng.integers(3, 500, 150).tolist()
    outs = engine.generate(
        prompt_token_ids=[prompt],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=6,
                                       ignore_eos=True),
    )
    assert len(outs[0].output_token_ids) == 6


def test_int2_pack_roundtrip():
    from sparsevllm_tpu.ops import quant

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(6, 64)), jnp.float32)
    packed, scale, zero = quant.pack_int2_groups(x, group=32)
    assert packed.shape == (6, 16)
    back = quant.unpack_int2_groups(packed, scale, zero, group=32)
    # 2-bit lattice: error bounded by scale/2 per group
    err = np.abs(np.asarray(back - x))
    bound = np.asarray(scale).repeat(32, -1) * 0.51
    assert np.all(err <= bound)
    # exact on a 4-level lattice
    lv = jnp.asarray(rng.choice([-1.5, -0.5, 0.5, 1.5], size=(4, 32)))
    p2, s2, z2 = quant.pack_int2_groups(lv, group=32)
    np.testing.assert_allclose(
        quant.unpack_int2_groups(p2, s2, z2, group=32), lv, atol=1e-6
    )


def test_deltakv_tail_recompression_lossless(tmp_path, hf_model):
    """Decode-tail re-compression under the lossless config must not
    change generation, and must actually fold the tail into latents."""
    cfg, model = hf_model
    common = dict(
        sparse_method="deltakv",
        full_attention_layers=(0,),
        deltakv_checkpoint_path=_identity_ckpt(tmp_path),
        deltakv_cluster_ratio=1.0,
        deltakv_max_compressed_tokens=256,
        decode_keep_tokens=256,
        sink_keep_tokens=8, recent_keep_tokens=16,
        **BASE,
    )
    prompt = np.random.default_rng(9).integers(3, 500, 120).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=48, ignore_eos=True)

    ref_eng = LLM(deltakv_recompress_interval=0, **common)
    (ref_out,) = ref_eng.generate(prompt_token_ids=[prompt],
                                  sampling_params=sp)

    eng = LLM(deltakv_recompress_interval=16, **common)
    sid = eng.add_request(prompt_token_ids=list(prompt), sampling_params=sp)
    seq = eng._seqs[sid]
    comp_after_prefill = None
    max_comp = 0
    while eng.scheduler.has_work:
        eng.step()
        c = eng.kv.comp_counts.get(sid)
        if c is not None:
            if comp_after_prefill is None:
                comp_after_prefill = c
            max_comp = max(max_comp, c)
    assert max_comp > comp_after_prefill, (
        "tail re-compression never triggered"
    )
    # Re-compression changes the raw/latent split, i.e. the SUMMATION
    # ORDER of a mathematically identical attention set; on the random
    # tiny model sub-0.01 logit gaps then flip argmax. Judge both runs
    # against HF with the near-tie tolerance instead of each other.
    assert_hf_consistent(model, prompt, ref_out.output_token_ids)
    assert_hf_consistent(model, prompt, seq.completion_token_ids)


def test_deltakv_kivi_pool_e2e(tmp_path, hf_model):
    """deltakv_kivi_bits=8: full layers AND raw sparse regions live in a
    quantized pool (reference KIVI full-layer cache); pipeline runs E2E
    and stays HF-consistent at int8 fidelity."""
    cfg, model = hf_model
    engine = LLM(
        sparse_method="deltakv",
        full_attention_layers=(0,),
        deltakv_checkpoint_path=_identity_ckpt(tmp_path),
        deltakv_cluster_ratio=1.0,
        deltakv_max_compressed_tokens=256,
        deltakv_kivi_bits=8,
        decode_keep_tokens=256,
        sink_keep_tokens=8, recent_keep_tokens=16,
        **BASE,
    )
    assert engine.config.kv_cache_dtype == "int8"
    prompt = np.random.default_rng(11).integers(3, 500, 120).tolist()
    (out,) = engine.generate(
        prompt_token_ids=[prompt],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=8,
                                       ignore_eos=True),
    )
    assert len(out.output_token_ids) == 8
    # int8 KV on a float32 model: argmax should track HF closely
    assert_hf_consistent(model, prompt, out.output_token_ids[:4], tol=0.25)


def test_deltakv_int2_latents_runs(tmp_path, hf_model):
    cfg, _ = hf_model
    engine = LLM(
        sparse_method="deltakv",
        full_attention_layers=(0,),
        deltakv_checkpoint_path=_identity_ckpt(tmp_path),
        deltakv_cluster_ratio=1.0,
        deltakv_max_compressed_tokens=256,
        deltakv_latent_bits=2,
        decode_keep_tokens=64,
        sink_keep_tokens=8, recent_keep_tokens=16,
        **BASE,
    )
    prompt = np.random.default_rng(12).integers(3, 500, 150).tolist()
    (out,) = engine.generate(
        prompt_token_ids=[prompt],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=6,
                                       ignore_eos=True),
    )
    assert len(out.output_token_ids) == 6


def test_deltakv_global_pool_lossless_and_accounted(tmp_path, hf_model):
    """config.global_kv_pool (r4): ONE page id space shared by all layers
    (per-layer tables route; cache arrays have a singleton layer dim) —
    the residency-honest pool for deltakv's asymmetric layers (observation
    layers keep the whole prompt, compressed layers keep sink+tail).
    Must be token-identical to dense HF at identity-codec settings, across
    TWO sequences (the second reuses the first's spliced global pages),
    with clean page accounting."""
    import os as _os

    from sparsevllm_tpu.engine import debug_checks

    cfg, model = hf_model
    engine = LLM(
        sparse_method="deltakv",
        full_attention_layers=(0,),
        deltakv_checkpoint_path=_identity_ckpt(tmp_path),
        deltakv_cluster_ratio=1.0,
        deltakv_max_compressed_tokens=256,
        decode_keep_tokens=256,
        sink_keep_tokens=8, recent_keep_tokens=16,
        global_kv_pool=True,
        # global pool: num_kv_pages is TOTAL pages across layers
        **{**BASE, "num_kv_pages": 2 * 512},
    )
    rng = np.random.default_rng(13)
    for trial in range(2):
        prompt = rng.integers(3, 500, 120).tolist()
        (out,) = engine.generate(
            prompt_token_ids=[prompt],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=6,
                                           ignore_eos=True),
        )
        assert_hf_consistent(model, prompt, out.output_token_ids)
        debug_checks.check_page_accounting(engine.kv, [])


def test_deltakv_global_pool_total_page_costs(tmp_path, hf_model):
    """Global-pool admission accounts TOTAL pages (all layers draw from
    one stack): a prompt needing more than num_kv_pages/L per layer must
    admit under GP sizing and the non-GP manager must reject the same
    pool size."""
    cfg, _ = hf_model
    kw = dict(
        sparse_method="deltakv",
        full_attention_layers=(0,),
        deltakv_checkpoint_path=_identity_ckpt(tmp_path),
        deltakv_cluster_ratio=1.0,
        deltakv_max_compressed_tokens=256,
        decode_keep_tokens=256,
        sink_keep_tokens=8, recent_keep_tokens=16,
    )
    eng = LLM(global_kv_pool=True, **kw, **{**BASE, "num_kv_pages": 256})
    seq_cost = eng.kv.admission_cost_pages(
        type("S", (), {"num_prompt_tokens": 120,
                       "streamed_prefill": False})()
    )
    assert seq_cost == 2 * -(-(121) // 8)  # L=2 layers x per-layer pages
    eng.exit()
