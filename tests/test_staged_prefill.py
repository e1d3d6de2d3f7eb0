"""Mixed-precision staged prefill (config.kv_staging_dtype).

Long prompts prefill into a quantized staging pool (attention over a
per-layer dequantized scratch) and move to the bf16 main pool at
prefill-end compaction — the round-3 headline lane (VERDICT r2 next#1/#2).

Contract pinned here:
  * bf16 staging is TOKEN-IDENTICAL to the plain resident path (the scratch
    holds the exact same values in the same logical order);
  * int4 staging runs e2e under the bounds + slot-leak debug checkers with
    clean pool accounting;
  * the staging pool admits long prompts one at a time and returns pages at
    compaction (a second long prompt is deferred, then admitted);
  * abort mid-staging returns staging pages.
"""

import numpy as np
import pytest

from sparsevllm_tpu.engine import debug_checks
from sparsevllm_tpu.engine.llm_engine import LLMEngine
from sparsevllm_tpu.models.spec import ModelSpec
from sparsevllm_tpu.models.weights import init_params
from sparsevllm_tpu.sampling_params import SamplingParams

SPEC = ModelSpec(
    model_type="llama", num_layers=2, hidden_size=64, num_q_heads=4,
    num_kv_heads=2, head_dim=16, intermediate_size=128, vocab_size=512,
    rms_norm_eps=1e-5, rope_theta=10000.0, max_position_embeddings=4096,
    tie_word_embeddings=True,
)
PARAMS = init_params(SPEC, seed=0, dtype="float32")


def _engine(**kw):
    base = dict(
        spec=SPEC, params=PARAMS, method="snapkv", dtype="float32",
        page_size=16, num_kv_pages=256, max_model_len=2048,
        chunk_prefill_size=128, max_num_batched_tokens=512,
        max_decoding_seqs=4, max_num_seqs_in_batch=4,
        prefill_keep_tokens=96, snapkv_obs_window=16,
        attention_impl="ref", decode_steps_per_dispatch=4,
    )
    base.update(kw)
    return LLMEngine(**base)


def _prompts(n, length=700):
    rng = np.random.default_rng(0)
    return [rng.integers(10, 500, size=length).tolist() for _ in range(n)]


def _gen(eng, prompts, max_tokens=10):
    sp = SamplingParams(temperature=0.0, ignore_eos=True,
                       max_tokens=max_tokens)
    outs = eng.generate(prompt_token_ids=prompts, sampling_params=sp)
    eng.exit()
    return [o.output_token_ids for o in outs]


def test_staged_bf16_token_identical_to_plain():
    prompts = _prompts(2)
    base = _gen(_engine(), prompts)
    staged = _gen(
        _engine(kv_staging_dtype="bfloat16", staging_threshold_tokens=256,
                num_staging_pages=128),
        prompts,
    )
    assert base == staged


def test_staged_int4_e2e_with_debug_checkers(monkeypatch):
    monkeypatch.setattr(debug_checks, "BOUNDS", True)
    monkeypatch.setattr(debug_checks, "SLOTS", True)
    eng = _engine(kv_staging_dtype="int4", staging_threshold_tokens=256,
                  num_staging_pages=128)
    kv = eng.kv
    out = _gen(eng, _prompts(2), max_tokens=8)
    assert all(len(o) == 8 for o in out)
    # all staging pages returned after compaction
    assert len(kv._stage_free) == kv.num_stage_pages - 1
    assert not kv._stage_held and not kv._stage_reserved


def test_second_long_prompt_defers_until_staging_frees():
    # staging pool fits ~one 700-token prompt (44 pages + margin)
    eng = _engine(kv_staging_dtype="int4", staging_threshold_tokens=256,
                  num_staging_pages=50)
    sp = SamplingParams(temperature=0.0, ignore_eos=True, max_tokens=4)
    for p in _prompts(2):
        eng.add_request(prompt_token_ids=p, sampling_params=sp)
    # both prompts want staging; only one can be admitted at a time
    eng.step()
    running = [s for s in eng.scheduler.running]
    assert len(running) == 1 and len(eng.scheduler.waiting) == 1
    while eng.scheduler.has_work:
        eng.step()
    outs = sorted(eng._outputs.values(), key=lambda o: o.request_id)
    assert all(len(o.output_token_ids) == 4 for o in outs)
    assert len(eng.kv._stage_free) == eng.kv.num_stage_pages - 1
    eng.exit()


def test_abort_mid_staging_returns_pages():
    eng = _engine(kv_staging_dtype="int4", staging_threshold_tokens=256,
                  num_staging_pages=128)
    sp = SamplingParams(temperature=0.0, ignore_eos=True, max_tokens=4)
    sid = eng.add_request(prompt_token_ids=_prompts(1)[0],
                          sampling_params=sp)
    eng.step()  # first staged chunk
    assert eng.kv._stage_held.get(sid)
    eng.abort_request(sid)
    assert len(eng.kv._stage_free) == eng.kv.num_stage_pages - 1
    assert sid not in eng.kv._stage_held
    eng.exit()


def test_staging_config_rejections():
    with pytest.raises(ValueError, match="compaction"):
        _engine(method="", kv_staging_dtype="int4")
    with pytest.raises(ValueError, match="float main pool"):
        _engine(kv_staging_dtype="int4", kv_cache_dtype="int8")
