"""Scheduler policy unit suite — pure CPU, no model, FakeOracle-driven.

Mirrors the reference's tier-1 pattern (tests/test_prefill_schedule_policy.py:
scheduler exercised against a hand-written FakeMemoryOracle with
SimpleNamespace configs): admission deferral vs raise, long/short bucketing,
chunked-prefill progression, observation-window final-chunk floor, padding
token-budget grouping, decode preemption rules (refuses victims with
generated tokens; loud deadlock), postprocess finish reasons, megastep
truncation, abort.
"""

from __future__ import annotations

from types import SimpleNamespace

import pytest

from sparsevllm_tpu.engine.scheduler import Scheduler
from sparsevllm_tpu.engine.sequence import FinishReason, SeqStatus, Sequence
from sparsevllm_tpu.sampling_params import SamplingParams


class FakeOracle:
    """Implements the MemoryOracle surface the Scheduler consumes
    (engine/memory_oracle.py), with a plain page counter."""

    def __init__(self, free_pages=1024, page_size=16, free_rows=64):
        self.free_pages = free_pages
        self.page_size = page_size
        self.free_rows = free_rows
        self.freed: list[int] = []
        self.prefix_tokens = 0  # tokens try_attach_prefix reports

    def num_free_pages(self):
        return self.free_pages

    def num_free_rows(self):
        return self.free_rows

    def admission_cost_pages(self, seq):
        return -(-seq.num_prompt_tokens // self.page_size)

    def can_admit(self, seq):
        return (
            self.admission_cost_pages(seq) <= self.free_pages
            and self.free_rows > 0
        )

    def alloc_row(self, seq):
        seq.row = 0
        self.free_rows -= 1
        return 0

    def try_attach_prefix(self, seq):
        return self.prefix_tokens

    def prefill_step_cost_pages(self, seq, chunk):
        return -(-chunk // self.page_size)

    def decode_step_cost_pages(self, seq, k=1):
        return 1

    def seq_resident_pages(self, seq):
        return -(-seq.num_tokens // self.page_size)

    def free_seq(self, seq):
        self.freed.append(seq.seq_id)
        self.free_rows += 1
        self.free_pages += self.seq_resident_pages(seq)

    def free_slot_stats(self):
        return {"free_pages": self.free_pages}


def make_config(**over):
    base = dict(
        chunk_prefill_size=512,
        max_model_len=4096,
        max_num_seqs_in_batch=8,
        max_num_batched_tokens=2048,
        max_decoding_seqs=16,
        decode_steps_per_dispatch=1,
        prompt_admission_failure_action="defer",
        snapkv_obs_window=32,
        method_profile=SimpleNamespace(needs_prefill_scores=False),
    )
    base.update(over)
    return SimpleNamespace(**base)


def make_seq(prompt_len=100, max_tokens=64, **sp):
    return Sequence(
        prompt_token_ids=list(range(prompt_len)),
        sampling_params=SamplingParams(max_tokens=max_tokens, **sp),
    )


def make_sched(config=None, oracle=None, eos=(2,)):
    config = config or make_config()
    oracle = oracle or FakeOracle()
    return Scheduler(config, oracle, eos_token_ids=eos), oracle


# ---------------------------------------------------------------- admission


def test_prompt_at_max_model_len_rejected_at_add():
    sched, _ = make_sched(make_config(max_model_len=128))
    with pytest.raises(ValueError, match="max_model_len"):
        sched.add(make_seq(prompt_len=128))


def test_admission_deferred_when_no_pages_and_engine_busy():
    sched, oracle = make_sched()
    s1 = make_seq(prompt_len=100)
    sched.add(s1)
    assert sched.schedule().seqs == [s1]
    oracle.free_pages = 0
    s2 = make_seq(prompt_len=100)
    sched.add(s2)
    # s1 still mid-engine; s2 must stay queued, not raise.
    batch = sched.schedule()
    assert s2 not in (batch.seqs if batch else [])
    assert s2 in sched.waiting


def test_admission_raise_on_empty_engine_when_configured():
    cfg = make_config(prompt_admission_failure_action="raise")
    sched, oracle = make_sched(cfg, FakeOracle(free_pages=0))
    sched.add(make_seq(prompt_len=100))
    with pytest.raises(RuntimeError, match="cannot be admitted"):
        sched.schedule()


def test_admission_defer_on_empty_engine_logs_and_waits():
    sched, oracle = make_sched(oracle=FakeOracle(free_pages=0))
    seq = make_seq(prompt_len=100)
    sched.add(seq)
    assert sched.schedule() is None
    assert seq in sched.waiting
    oracle.free_pages = 1024
    assert sched.schedule().seqs == [seq]


def test_prefix_hit_advances_prefill_progress():
    sched, oracle = make_sched()
    oracle.prefix_tokens = 64
    seq = make_seq(prompt_len=100)
    sched.add(seq)
    batch = sched.schedule()
    assert seq.num_prefilled_tokens == 64
    assert batch.chunk_sizes == [36]


# ------------------------------------------------------- long/short bucketing


def test_long_prompt_runs_alone():
    sched, _ = make_sched()  # chunk=512 -> long threshold 512
    long = make_seq(prompt_len=2000)
    short = make_seq(prompt_len=100)
    sched.add(long)
    sched.add(short)
    batch = sched.schedule()
    # shorts win the slot; long waits (reference long/short split).
    assert batch.seqs == [short]
    sched.postprocess(batch, [5])
    batch2 = sched.schedule()
    assert batch2.seqs == [long]
    assert batch2.chunk_sizes == [512]


def test_long_prompt_chunks_to_completion():
    sched, _ = make_sched()
    seq = make_seq(prompt_len=1300)
    sched.add(seq)
    sizes = []
    while not seq.prefill_done:
        batch = sched.schedule()
        assert batch.is_prefill and batch.seqs == [seq]
        sizes.append(batch.chunk_sizes[0])
        sched.postprocess(batch, [7])
    assert sizes == [512, 512, 276]
    assert seq.status == SeqStatus.DECODING
    assert seq.completion_token_ids == [7]  # sampled on final chunk only


def test_obs_window_final_chunk_floor():
    """Score-collecting methods must not leave a final chunk smaller than the
    observation window (reference snapkv.py:401 min_final_prefill_chunk)."""
    cfg = make_config(
        method_profile=SimpleNamespace(needs_prefill_scores=True),
        snapkv_obs_window=32,
    )
    sched, _ = make_sched(cfg)
    seq = make_seq(prompt_len=512 + 10)  # naive split = 512 + 10 < window
    sched.add(seq)
    batch = sched.schedule()
    assert batch.chunk_sizes == [490]  # 522 - 32
    sched.postprocess(batch, [0])
    batch = sched.schedule()
    assert batch.chunk_sizes == [32]


# ------------------------------------------------------ padding token budget


def test_padded_token_budget_bounds_batch():
    """TPU accounting: batch cost is B * max(chunk) (padded), so mixing one
    big chunk with many small ones is bounded by the padded product."""
    cfg = make_config(max_num_batched_tokens=1024, chunk_prefill_size=512)
    sched, _ = make_sched(cfg)
    big = make_seq(prompt_len=512)
    smalls = [make_seq(prompt_len=64) for _ in range(6)]
    for s in [big] + smalls:
        sched.add(s)
    batch = sched.schedule()
    # sorted descending by chunk: 512 first; 2*512 = 1024 fits; 3*512 > 1024.
    assert len(batch.seqs) == 2
    assert batch.seqs[0] is big
    assert max(batch.chunk_sizes) == 512


def test_page_budget_shrinks_step():
    sched, oracle = make_sched()
    oracle.free_pages = 8  # 8 pages * 16 = 128 tokens
    a, b = make_seq(prompt_len=100), make_seq(prompt_len=100)
    sched.add(a)
    sched.add(b)
    batch = sched.schedule()
    assert len(batch.seqs) == 1  # second seq dropped from the step


# ------------------------------------------------------------------- decode


def _drain_prefill(sched, seqs, token=5):
    while True:
        batch = sched._schedule_prefill()
        if batch is None:
            return
        sched.postprocess(batch, [token] * len(batch.seqs))


def test_decode_short_first_ordering():
    cfg = make_config(max_decoding_seqs=2)
    sched, _ = make_sched(cfg)
    seqs = [make_seq(prompt_len=n) for n in (300, 100, 200)]
    for s in seqs:
        sched.add(s)
    _drain_prefill(sched, seqs)
    batch = sched.schedule()
    assert not batch.is_prefill
    assert [s.num_prompt_tokens for s in batch.seqs] == [100, 200]


def test_preemption_refuses_victims_with_completions():
    sched, oracle = make_sched()
    a = make_seq(prompt_len=100)
    sched.add(a)
    _drain_prefill(sched, [a])  # a now has 1 completion token
    batch = sched.schedule()
    sched.postprocess(batch, [[5]])
    oracle.free_pages = 0
    with pytest.raises(RuntimeError, match="no preemptible"):
        sched.schedule()


def test_preemption_requeues_prefill_only_victim():
    sched, oracle = make_sched()
    a, b = make_seq(prompt_len=100), make_seq(prompt_len=600)
    sched.add(a)
    batch = sched.schedule()
    sched.postprocess(batch, [5])  # a decoding with 1 token
    sched.add(b)
    batch = sched.schedule()  # b first chunk (512)
    sched.postprocess(batch, [0])
    oracle.free_pages = 0
    batch = sched.schedule()  # decode for a; must preempt b (no completions)
    assert batch is not None and not batch.is_prefill
    assert batch.preempted == [b]
    assert b.status == SeqStatus.WAITING
    assert b.num_prefilled_tokens == 0  # full prefill replay
    assert oracle.freed == [b.seq_id]
    assert sched.num_preemptions == 1


def test_decode_reset_after_preemption_guard():
    seq = make_seq(prompt_len=10)
    seq.completion_token_ids.append(1)
    with pytest.raises(RuntimeError, match="decode replay unsupported"):
        seq.reset_for_preemption()


# -------------------------------------------------------------- postprocess


def test_finish_on_eos_stop_token_and_lengths():
    sched, _ = make_sched(eos=(2,))
    eos_seq = make_seq(prompt_len=10)
    stop_seq = make_seq(prompt_len=10, stop_token_ids=(99,))
    len_seq = make_seq(prompt_len=10, max_tokens=1)
    ignore = make_seq(prompt_len=10, ignore_eos=True)
    for s in (eos_seq, stop_seq, len_seq, ignore):
        sched.add(s)
    # max_tokens=1 finishes at the prefill-sampled token already.
    _drain_prefill(sched, [], token=5)
    assert len_seq.is_finished
    assert len_seq.finish_reason == FinishReason.LENGTH
    batch = sched.schedule()
    assert len_seq not in batch.seqs
    order = {s.seq_id: i for i, s in enumerate(batch.seqs)}
    toks = [[0]] * len(batch.seqs)
    toks[order[eos_seq.seq_id]] = [2]
    toks[order[stop_seq.seq_id]] = [99]
    toks[order[ignore.seq_id]] = [2]
    finished = sched.postprocess(batch, toks)
    assert eos_seq in finished and eos_seq.finish_reason == FinishReason.STOP
    assert stop_seq in finished and stop_seq.finish_reason == FinishReason.STOP
    assert ignore not in finished


def test_megastep_truncates_after_finish():
    sched, _ = make_sched(make_config(decode_steps_per_dispatch=4), eos=(2,))
    seq = make_seq(prompt_len=10)
    sched.add(seq)
    _drain_prefill(sched, [seq])
    batch = sched.schedule()
    finished = sched.postprocess(batch, [[7, 2, 8, 9]])
    assert seq in finished
    # tokens after EOS are discarded (prefill sampled 5, then 7, then EOS 2)
    assert seq.completion_token_ids == [5, 7, 2]


def test_max_model_len_finish():
    cfg = make_config(max_model_len=16)
    sched, _ = make_sched(cfg)
    seq = make_seq(prompt_len=14, max_tokens=64)
    sched.add(seq)
    _drain_prefill(sched, [seq])
    batch = sched.schedule()
    finished = sched.postprocess(batch, [[1]])
    assert seq in finished
    assert seq.finish_reason == FinishReason.LENGTH


def test_abort_waiting_and_running():
    sched, _ = make_sched()
    a, b = make_seq(), make_seq()
    sched.add(a)
    sched.add(b)
    batch = sched.schedule()
    assert {s.seq_id for s in batch.seqs} == {a.seq_id, b.seq_id}
    got = sched.abort(a.seq_id)
    assert got is a and a.status == SeqStatus.ABORTED
    assert a not in sched.running
    c = make_seq()
    sched.add(c)
    assert sched.abort(c.seq_id) is c
    assert c not in sched.waiting
    assert sched.abort(123456) is None
