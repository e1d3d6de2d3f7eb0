"""Megastep length auto-tuning (VERDICT r1 weak#8).

The decode megastep runs k steps per jitted dispatch; a sequence finishing
at step t < k burns k-t lane-steps. The engine now (a) clamps k to the
largest remaining max_tokens budget in the batch, and (b) AIMD-tunes an
adaptive k from observed mid-megastep finishes. Reference analogue: the
per-step CUDA-graph replay never overshoots (decode_cuda_graph_runner), so
parity here means bounding the overshoot, not eliminating dispatch
batching.
"""

import numpy as np

from sparsevllm_tpu import SamplingParams
from sparsevllm_tpu.engine.llm_engine import LLM


def make_engine(**overrides):
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
        decode_steps_per_dispatch=8,
    )
    kwargs.update(overrides)
    return LLM(**kwargs)


def record_dispatch_ks(engine):
    """Wrap executor.run_decode to record the k of every dispatch."""
    ks = []
    orig = engine.executor.run_decode

    def wrapper(seqs, dest_slots, ctx_start, row_ids, **kw):
        ks.append(dest_slots.shape[2])
        return orig(seqs, dest_slots, ctx_start, row_ids, **kw)

    engine.executor.run_decode = wrapper
    return ks


def test_k_clamped_to_max_tokens_budget():
    engine = make_engine()
    ks = record_dispatch_ks(engine)
    prompt = list(np.random.default_rng(0).integers(3, 250, size=12))
    engine.add_request(
        prompt_token_ids=[int(t) for t in prompt],
        sampling_params=SamplingParams(
            max_tokens=5, temperature=0.0, ignore_eos=True
        ),
    )
    while engine.scheduler.has_work:
        engine.step()
    # 5 tokens: one from the prefill step, then megasteps clamped to the
    # remaining budget (4 -> power-of-2 bucket 4), never the configured 8.
    assert sum(ks) + 1 == 5, ks
    assert max(ks) <= 4, ks


def test_aimd_shrinks_k_on_eos_heavy_workload():
    engine = make_engine()
    # The tiny-random model emits arbitrary tokens; force "EOS" finishes by
    # declaring a broad stop set so most megasteps finish mid-dispatch.
    stop_ids = list(range(3, 200))
    for i in range(4):
        prompt = list(
            np.random.default_rng(i).integers(200, 250, size=8)
        )
        engine.add_request(
            prompt_token_ids=[int(t) for t in prompt],
            sampling_params=SamplingParams(
                max_tokens=64, temperature=0.0, stop_token_ids=stop_ids
            ),
        )
    while engine.scheduler.has_work:
        engine.step()
    # Nearly every sequence stops within a couple of tokens; AIMD must have
    # pulled the adaptive estimate well below the configured 8.
    assert engine._adaptive_k <= 4


def test_aimd_recovers_after_clean_dispatches():
    engine = make_engine()
    engine._adaptive_k = 1  # as if a stop-heavy burst just happened
    prompt = list(np.random.default_rng(1).integers(3, 250, size=8))
    engine.add_request(
        prompt_token_ids=[int(t) for t in prompt],
        sampling_params=SamplingParams(
            max_tokens=33, temperature=0.0, ignore_eos=True
        ),
    )
    while engine.scheduler.has_work:
        engine.step()
    # 32 decode tokens of fully-consumed dispatches: 1+2+4+8+8+8+1(rem=1)
    # doubling path must have restored the estimate to the configured k.
    assert engine._adaptive_k == 8
