"""E2E engine-vs-HF logits/token parity on the tiny-random model.

Mirrors the reference keystone test (tests/test_tiny_random.py): the engine
runs the full stack (scheduler -> paged KV -> scan decoder -> sampler) on a
seeded tiny model and greedy generations must match HF teacher-forced argmax.
"""

import numpy as np
import pytest
import torch

from sparsevllm_tpu import SamplingParams
from sparsevllm_tpu.engine.llm_engine import LLM
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


def make_engine(**overrides):
    kwargs = dict(
        tiny_random=True,
        tiny_random_seed=SEED,
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


def test_engine_greedy_matches_hf(hf_model):
    cfg, model = hf_model
    engine = make_engine()
    rng = np.random.default_rng(3)
    prompts = [
        rng.integers(3, cfg["vocab_size"], int(n)).tolist()
        for n in (17, 43, 99)
    ]
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    outs = engine.generate(prompt_token_ids=prompts, sampling_params=sp)
    for prompt, out in zip(prompts, outs):
        ref = hf_greedy(model, prompt, 8)
        assert out.output_token_ids == ref, (
            f"engine {out.output_token_ids} != hf {ref} for len {len(prompt)}"
        )


def test_chunked_prefill_matches_hf(hf_model):
    cfg, model = hf_model
    # prompt longer than chunk => multiple prefill steps
    engine = make_engine(chunk_prefill_size=32, max_num_batched_tokens=128)
    rng = np.random.default_rng(5)
    prompt = rng.integers(3, cfg["vocab_size"], 101).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    (out,) = engine.generate(prompt_token_ids=[prompt], sampling_params=sp)
    assert out.output_token_ids == hf_greedy(model, prompt, 6)


def test_continuous_batching_mixed_lengths(hf_model):
    cfg, model = hf_model
    engine = make_engine()
    rng = np.random.default_rng(11)
    prompts = [
        rng.integers(3, cfg["vocab_size"], int(n)).tolist()
        for n in (9, 71, 33, 120, 55)
    ]
    sp = SamplingParams(temperature=0.0, max_tokens=5)
    outs = engine.generate(prompt_token_ids=prompts, sampling_params=sp)
    for prompt, out in zip(prompts, outs):
        assert out.output_token_ids == hf_greedy(model, prompt, 5)
