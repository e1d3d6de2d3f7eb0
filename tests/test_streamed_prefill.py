"""Streamed long-prefill (host KV archive) vs the resident path.

The streamed path (engine/streamed_prefill.py) must produce the same
compacted KV state and the same greedy generation as the standard
snapkv resident path — it is an execution strategy, not a method change.
"""

import numpy as np
import pytest

from sparsevllm_tpu.engine.llm_engine import LLMEngine
from sparsevllm_tpu.sampling_params import SamplingParams

CTX = 700
CHUNK = 256
KEEP = 320


# routing is residency-aware (scheduler.add): a long prompt streams only
# when DENSE admission cannot ever fit the pool. Dense cost here is
# ceil(701/8) + ceil(KEEP/8) = 128 pages, so 120 pages forces streaming
# while 256 keeps the resident path.
STREAM_PAGES = 120


def _engine(threshold, pages=256):
    return LLMEngine(
        tiny_random=True,
        dtype="float32",
        page_size=8,
        num_kv_pages=pages,
        max_model_len=1024,
        chunk_prefill_size=CHUNK,
        max_num_batched_tokens=1024,
        max_decoding_seqs=2,
        max_num_seqs_in_batch=2,
        method="snapkv",
        prefill_keep_tokens=KEEP,
        snapkv_obs_window=32,
        snapkv_kernel_size=5,
        long_prefill_offload_threshold=threshold,
        decode_context_bucket_base=64,
        decode_steps_per_dispatch=4,
    )


def _generate(eng, prompt, steps):
    (out,) = eng.generate(
        prompt_token_ids=[prompt],
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=steps, ignore_eos=True
        ),
    )
    return out


@pytest.fixture(scope="module")
def prompt():
    rng = np.random.default_rng(7)
    return rng.integers(5, 500, size=CTX).tolist()


def _dk_engine(threshold, pages=256):
    # max_model_len 2048: the resident compress op buckets the region to
    # the next pow2 (616 -> 1024 tokens), which must stay inside the
    # context-page bucket ladder
    return LLMEngine(
        tiny_random=True,
        dtype="float32",
        page_size=8,
        num_kv_pages=pages,
        max_model_len=2048,
        chunk_prefill_size=CHUNK,
        max_num_batched_tokens=1024,
        max_decoding_seqs=2,
        max_num_seqs_in_batch=2,
        method="deltakv",
        full_attention_layers=(0,),
        deltakv_compressor_arch="origin",
        deltakv_cluster_ratio=0.25,
        deltakv_max_compressed_tokens=1024,
        decode_keep_tokens=64,
        sink_keep_tokens=16,
        recent_keep_tokens=64,
        long_prefill_offload_threshold=threshold,
        decode_context_bucket_base=64,
        decode_steps_per_dispatch=4,
    )


def test_streamed_deltakv_matches_resident(prompt):
    """DeltaKV's streamed tier (archive adoption for full/sink/recent +
    block-wise compression straight from the archive) must be
    token-identical to the resident prefill-end compression: blocks are
    stride-aligned so sequential compression reproduces the one-shot
    center/father assignment exactly."""
    res = _generate(_dk_engine(threshold=0), list(prompt), steps=12)
    # pool too small for dense admission (88 prompt pages + 88 compaction
    # headroom) -> streams
    eng_s = _dk_engine(threshold=CHUNK, pages=120)
    st = _generate(eng_s, list(prompt), steps=12)
    assert res.output_token_ids == st.output_token_ids
    assert res.finish_reason == st.finish_reason


def test_streamed_matches_resident(prompt):
    res = _generate(_engine(threshold=0), list(prompt), steps=12)
    # prompt > chunk AND dense admission exceeds the pool -> streamed
    eng_s = _engine(threshold=CHUNK, pages=STREAM_PAGES)
    st = _generate(eng_s, list(prompt), steps=12)
    assert res.output_token_ids == st.output_token_ids
    assert res.finish_reason == st.finish_reason


def test_streamed_row_state(prompt):
    eng = _engine(threshold=CHUNK, pages=STREAM_PAGES)
    eng.add_request(
        prompt_token_ids=list(prompt),
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=4, ignore_eos=True
        ),
    )
    # drive prefill to completion
    while any(
        not s.prefill_done for s in eng.scheduler.running
    ) or eng.scheduler.waiting:
        eng.step()
    (seq,) = eng.scheduler.running
    assert getattr(seq, "streamed_prefill", False)
    row = eng.kv.seq_rows[seq.seq_id]
    # +1: the first decode token's KV lands right after adoption
    lens = eng.kv.row_lens[:, row]
    assert np.all((lens == KEEP) | (lens == KEEP + 1)), lens
    # archive must be dropped after adoption
    assert seq.seq_id not in eng.executor.streamed._archives
    while eng.scheduler.has_work:
        eng.step()


def test_routing_prefers_resident_when_pool_fits(prompt):
    """Above-threshold prompts whose dense admission FITS the pool take
    the resident paged-kernel path (the archive re-stream is strictly
    slower whenever residency is possible, e.g. quantized 128K)."""
    eng = _engine(threshold=CHUNK)  # 256 pages: dense cost 128 fits
    eng.add_request(
        prompt_token_ids=list(prompt),
        sampling_params=SamplingParams(temperature=0.0, max_tokens=2),
    )
    (seq,) = eng.scheduler.waiting
    assert not getattr(seq, "streamed_prefill", False)
    eng.abort_request(seq.seq_id)


def test_streamed_admission_fits_small_pool(prompt):
    """A streamed prompt admits into a pool that could never hold the whole
    prompt resident — the offload tier's reason to exist."""
    small_pages = (KEEP // 8) + 10  # << CTX/8 prompt pages
    eng = LLMEngine(
        tiny_random=True,
        dtype="float32",
        page_size=8,
        num_kv_pages=small_pages,
        max_model_len=1024,
        chunk_prefill_size=CHUNK,
        max_num_batched_tokens=1024,
        max_decoding_seqs=1,
        max_num_seqs_in_batch=1,
        method="snapkv",
        prefill_keep_tokens=KEEP,
        snapkv_obs_window=32,
        long_prefill_offload_threshold=CHUNK,
        decode_context_bucket_base=64,
        decode_steps_per_dispatch=4,
        prompt_admission_failure_action="raise",
    )
    out = _generate(eng, list(prompt), steps=6)
    assert len(out.output_token_ids) == 6


def test_resident_admission_rejects_small_pool(prompt):
    """Same pool without the offload tier must fail loudly at admission."""
    small_pages = (KEEP // 8) + 10
    eng = LLMEngine(
        tiny_random=True,
        dtype="float32",
        page_size=8,
        num_kv_pages=small_pages,
        max_model_len=1024,
        chunk_prefill_size=CHUNK,
        max_num_batched_tokens=1024,
        max_decoding_seqs=1,
        max_num_seqs_in_batch=1,
        method="snapkv",
        prefill_keep_tokens=KEEP,
        snapkv_obs_window=32,
        long_prefill_offload_threshold=0,
        decode_context_bucket_base=64,
        decode_steps_per_dispatch=4,
        prompt_admission_failure_action="raise",
    )
    eng.add_request(
        prompt_token_ids=list(prompt),
        sampling_params=SamplingParams(temperature=0.0, max_tokens=4),
    )
    with pytest.raises(RuntimeError, match="cannot be admitted"):
        while eng.scheduler.has_work:
            eng.step()
