"""Scheduler policy MATRIX suite — breadth tier (VERDICT r4 next #6).

Ports the reference's test_prefill_schedule_policy.py breadth (3,381 LoC of
admission-failure matrices, preemption storms, deadlock diagnostics, chunk
bookkeeping) onto this scheduler: every test is pure-CPU against a
FakeOracle, mirroring the reference tier-1 pattern (SURVEY §4).

Complements tests/test_scheduler_policy.py (the core behaviors); this file
is the combinatorial edges: admission x method x routing, storms, FIFO
head-blocking, budget boundaries, postprocess edge cases.
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import pytest

from sparsevllm_tpu.engine.scheduler import Scheduler
from sparsevllm_tpu.engine.sequence import FinishReason, SeqStatus, Sequence
from sparsevllm_tpu.sampling_params import SamplingParams


class FakeOracle:
    """MemoryOracle stand-in with page/row counters and call recording."""

    def __init__(self, free_pages=1024, page_size=16, free_rows=64,
                 decode_cost_per_k=False, num_pages=None):
        self.free_pages = free_pages
        self.page_size = page_size
        self.free_rows = free_rows
        self.num_pages = num_pages if num_pages is not None else free_pages
        self.freed: list[int] = []
        self.prefix_tokens = 0
        self.decode_cost_per_k = decode_cost_per_k
        self.staging_wanted = None  # None = no wants_staging attr behavior

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
        return k if self.decode_cost_per_k else 1

    def seq_resident_pages(self, seq):
        return -(-seq.num_tokens // self.page_size)

    def free_seq(self, seq):
        self.freed.append(seq.seq_id)
        self.free_rows += 1
        self.free_pages += self.seq_resident_pages(seq)

    def free_slot_stats(self):
        return {"free_pages": self.free_pages}


class StagingOracle(FakeOracle):
    def __init__(self, *a, staging_threshold=1000, **kw):
        super().__init__(*a, **kw)
        self.staging_threshold = staging_threshold

    def wants_staging(self, seq):
        return seq.num_prompt_tokens > self.staging_threshold


def make_config(**over):
    base = dict(
        chunk_prefill_size=512,
        max_model_len=65536,
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


def drive_to_decode(sched, seq):
    """Run prefill steps until seq decodes (greedy token 5)."""
    while not seq.prefill_done:
        b = sched.schedule()
        assert b is not None and b.is_prefill
        sched.postprocess(b, np.full(len(b.seqs), 5))


# ================================================== admission matrix


@pytest.mark.parametrize("action", ["defer", "raise"])
def test_admission_failure_on_busy_engine_never_raises(action):
    """raise fires ONLY on an empty engine (reference :416-504): with any
    work in flight the failure is always a defer."""
    sched, oracle = make_sched(
        make_config(prompt_admission_failure_action=action),
        FakeOracle(free_pages=12, page_size=16),
    )
    first = make_seq(prompt_len=100)  # 7 pages
    sched.add(first)
    b = sched.schedule()
    assert b.is_prefill
    big = make_seq(prompt_len=200)  # 13 pages > 12-7 free
    sched.add(big)
    b2 = sched.schedule()  # must not raise regardless of action
    assert big in sched.waiting
    assert big not in b2.seqs


@pytest.mark.parametrize("rows", [0, 1])
def test_admission_row_exhaustion(rows):
    """Zero free rows defers even with ample pages; one row admits one."""
    sched, oracle = make_sched(oracle=FakeOracle(free_rows=rows))
    a, b = make_seq(50), make_seq(50)
    sched.add(a)
    sched.add(b)
    batch = sched.schedule()
    if rows == 0:
        assert batch is None
        assert len(sched.waiting) == 2
    else:
        assert [s.seq_id for s in batch.seqs] == [a.seq_id]
        assert list(sched.waiting) == [b]


def test_admission_fifo_head_blocking():
    """A too-big head-of-queue prompt blocks later admittable prompts:
    FCFS admission, no queue-jumping (reference pops only waiting[0])."""
    sched, oracle = make_sched(
        oracle=FakeOracle(free_pages=10, page_size=16))
    big = make_seq(prompt_len=300)  # 19 pages > 10
    small = make_seq(prompt_len=32)  # would fit
    sched.add(big)
    sched.add(small)
    assert sched.schedule() is None
    assert list(sched.waiting) == [big, small]


def test_admission_cap_respects_in_progress_prefills():
    """max_num_seqs_in_batch counts in-progress prefills + new admits."""
    sched, _ = make_sched(make_config(
        max_num_seqs_in_batch=2, max_num_batched_tokens=8192))
    s1, s2, s3 = make_seq(120), make_seq(120), make_seq(120)
    for s in (s1, s2, s3):
        sched.add(s)
    b = sched.schedule()
    assert len(b.seqs) == 2  # s3 stays waiting
    assert list(sched.waiting) == [s3]
    sched.postprocess(b, np.full(2, 5))
    b2 = sched.schedule()  # s1/s2 now decode; s3 admits next
    assert b2.is_prefill and b2.seqs == [s3]


def test_admission_recovers_after_free():
    sched, oracle = make_sched(
        make_config(prompt_admission_failure_action="defer"),
        FakeOracle(free_pages=8, page_size=16),
    )
    a = make_seq(prompt_len=100, max_tokens=2)  # 7 pages
    sched.add(a)
    drive_to_decode(sched, a)
    b = make_seq(prompt_len=100)
    sched.add(b)
    oracle.free_pages = 2  # decode growth consumed pages
    assert b not in (sched.schedule() or SimpleNamespace(seqs=[])).seqs
    # finish a -> frees pages -> b admits
    db = sched.schedule()
    done = sched.postprocess(db, np.array([[7]]))
    assert done and done[0] is a
    oracle.free_pages = 8
    b2 = sched.schedule()
    assert b in b2.seqs


def test_raise_message_contains_budget_diagnostics():
    sched, _ = make_sched(
        make_config(prompt_admission_failure_action="raise"),
        FakeOracle(free_pages=3, page_size=16),
    )
    sched.add(make_seq(prompt_len=200))
    with pytest.raises(RuntimeError) as ei:
        sched.schedule()
    msg = str(ei.value)
    assert "13 pages" in msg and "3 free" in msg


def test_full_prefix_hit_still_schedules_final_token():
    """A prefix hit covering all but the tail must leave >=1 token to
    prefill (the engine needs a forward to sample the first token)."""
    sched, oracle = make_sched()
    oracle.prefix_tokens = 96
    s = make_seq(prompt_len=100)
    sched.add(s)
    b = sched.schedule()
    assert b.chunk_sizes == [4]
    sched.postprocess(b, np.array([5]))
    assert s.status == SeqStatus.DECODING


# ================================================== routing matrix (add)


@pytest.mark.parametrize("method,streams", [
    ("snapkv", True), ("pyramidkv", True), ("deltakv", True),
    ("omnikv", False), ("", False), ("quest", False),
])
def test_streamed_routing_is_method_gated(method, streams):
    """Only compaction-bounded methods may take the host-archive path
    (reference long_bs1full + RawKV offload, scheduler.py:171-221)."""
    cfg = make_config(method=method, long_prefill_offload_threshold=256)
    oracle = FakeOracle(free_pages=10, page_size=16, num_pages=10)
    sched, _ = make_sched(cfg, oracle)
    s = make_seq(prompt_len=400)  # dense cost 25 > 9 -> stream if allowed
    sched.add(s)
    assert s.streamed_prefill is streams


def test_streamed_routing_prefers_resident_when_dense_fits():
    """Dense admission that fits the pool takes the fast resident path
    even above the offload threshold (H2D re-stream costs ~ctx^2)."""
    cfg = make_config(method="snapkv", long_prefill_offload_threshold=256)
    oracle = FakeOracle(free_pages=1024, page_size=16, num_pages=1024)
    sched, _ = make_sched(cfg, oracle)
    s = make_seq(prompt_len=400)
    sched.add(s)
    assert s.streamed_prefill is False


def test_staging_takes_precedence_over_streamed():
    cfg = make_config(method="snapkv", long_prefill_offload_threshold=256)
    oracle = StagingOracle(free_pages=10, page_size=16, num_pages=10,
                           staging_threshold=300)
    sched, _ = make_sched(cfg, oracle)
    s = make_seq(prompt_len=400)
    sched.add(s)
    assert s.staged_prefill is True
    assert s.streamed_prefill is False


def test_multimodal_long_prompt_rejected():
    cfg = make_config(method="snapkv", long_prefill_offload_threshold=256)
    sched, _ = make_sched(cfg)
    s = make_seq(prompt_len=400)
    s.mm_features = np.zeros((2, 8), np.float32)
    s.mm_positions = np.array([1, 2])
    with pytest.raises(ValueError, match="resident"):
        sched.add(s)


def test_multimodal_short_prompt_admits_resident():
    cfg = make_config(method="snapkv", long_prefill_offload_threshold=256)
    oracle = StagingOracle(staging_threshold=10)  # would stage text prompts
    sched, _ = make_sched(cfg, oracle)
    s = make_seq(prompt_len=100)
    s.mm_features = np.zeros((2, 8), np.float32)
    s.mm_positions = np.array([1, 2])
    sched.add(s)
    assert s.staged_prefill is False and s.streamed_prefill is False
    assert sched.schedule().seqs == [s]


# ================================================== long/short bucketing


def test_shorts_preferred_over_long_when_mixed():
    sched, _ = make_sched(make_config(chunk_prefill_size=128))
    long = make_seq(prompt_len=1000)
    s1, s2 = make_seq(64), make_seq(64)
    for s in (long, s1, s2):
        sched.add(s)
    b = sched.schedule()
    assert long not in b.seqs
    assert {id(s) for s in b.seqs} == {id(s1), id(s2)}


def test_single_long_at_bs1_even_with_multiple_longs():
    sched, _ = make_sched(make_config(chunk_prefill_size=128))
    l1, l2 = make_seq(1000), make_seq(900)
    sched.add(l1)
    sched.add(l2)
    b = sched.schedule()
    assert len(b.seqs) == 1 and b.seqs[0] is l1  # FIFO among longs


def test_staged_seq_counts_as_long_even_when_short_remaining():
    """Staged step fns are compiled bs=1; a staged seq must never batch
    with shorts even on its final sub-threshold chunk."""
    sched, _ = make_sched(make_config(chunk_prefill_size=128))
    staged = make_seq(prompt_len=100)
    staged.staged_prefill = True
    short = make_seq(prompt_len=64)
    sched.add(staged)
    sched.add(short)
    b = sched.schedule()
    # shorts win the step; the staged seq runs alone later
    assert b.seqs == [short]
    sched.postprocess(b, np.array([5]))
    b2 = sched.schedule()
    assert b2.seqs == [staged] and len(b2.seqs) == 1


def test_long_becomes_short_after_enough_chunks():
    """A long prompt's tail (< chunk) may batch with shorts."""
    sched, _ = make_sched(make_config(chunk_prefill_size=128,
                                      max_num_batched_tokens=512))
    long = make_seq(prompt_len=200)
    sched.add(long)
    b = sched.schedule()
    assert b.chunk_sizes == [128]
    sched.postprocess(b, np.array([5]))
    short = make_seq(prompt_len=60)
    sched.add(short)
    b2 = sched.schedule()
    # 72 remaining batches with the 60-token short
    assert {id(s) for s in b2.seqs} == {id(long), id(short)}


def test_padded_budget_counts_b_times_max_chunk():
    """TPU padding economics: cost = B * max(chunk), not sum(chunks)."""
    sched, _ = make_sched(make_config(
        chunk_prefill_size=512, max_num_batched_tokens=1024,
        max_num_seqs_in_batch=8))
    big = make_seq(prompt_len=500)
    smalls = [make_seq(prompt_len=100) for _ in range(4)]
    sched.add(big)
    for s in smalls:
        sched.add(s)
    b = sched.schedule()
    # sorted descending: big(500) first; 2*500=1000 fits, 3*500>1024
    assert len(b.seqs) == 2
    assert b.seqs[0] is big


# ================================================== chunk bookkeeping


@pytest.mark.parametrize("prompt,chunk,expect_steps", [
    (512, 512, 1), (513, 512, 2), (1536, 512, 3), (1, 512, 1),
])
def test_chunk_step_counts(prompt, chunk, expect_steps):
    sched, _ = make_sched(make_config(chunk_prefill_size=chunk))
    s = make_seq(prompt_len=prompt)
    sched.add(s)
    steps = 0
    while not s.prefill_done:
        b = sched.schedule()
        steps += 1
        sched.postprocess(b, np.array([5]))
    assert steps == expect_steps


@pytest.mark.parametrize("prompt,window,chunks", [
    # leftover after first chunk < w -> first chunk shrinks so the final
    # chunk covers the full observation window (reference snapkv.py:401)
    (530, 32, [498, 32]),
    # leftover exactly w -> no adjustment needed
    (544, 32, [512, 32]),
    # leftover > w -> untouched
    (600, 32, [512, 88]),
    # prompt < chunk: single chunk, no floor logic
    (100, 32, [100]),
])
def test_obs_window_final_chunk_matrix(prompt, window, chunks):
    cfg = make_config(
        snapkv_obs_window=window,
        method_profile=SimpleNamespace(needs_prefill_scores=True),
    )
    sched, _ = make_sched(cfg)
    s = make_seq(prompt_len=prompt)
    sched.add(s)
    got = []
    while not s.prefill_done:
        b = sched.schedule()
        got.extend(b.chunk_sizes)
        sched.postprocess(b, np.array([5]))
    assert got == chunks


def test_obs_floor_never_emits_zero_chunk():
    """remaining == w+? tiny prompts: chunk floor max(.,1)."""
    cfg = make_config(
        chunk_prefill_size=16, snapkv_obs_window=32,
        method_profile=SimpleNamespace(needs_prefill_scores=True),
    )
    sched, _ = make_sched(cfg)
    s = make_seq(prompt_len=33)
    sched.add(s)
    while not s.prefill_done:
        b = sched.schedule()
        assert all(c >= 1 for c in b.chunk_sizes)
        sched.postprocess(b, np.array([5]))


def test_page_budget_shrink_drops_smallest_chunks_first():
    """Shrink pops from the tail of the descending-sorted selection."""
    sched, oracle = make_sched(
        make_config(max_num_batched_tokens=8192),
        FakeOracle(free_pages=20, page_size=16),
    )
    big = make_seq(prompt_len=256)  # 16 pages
    small = make_seq(prompt_len=64)  # 4 pages... but oracle counts per-chunk
    sched.add(big)
    sched.add(small)
    oracle.free_pages = 17  # 16+4 > 17: someone must drop
    b = sched.schedule()
    assert b.seqs == [big]
    assert small in sched.running  # admitted; just not in this step


def test_page_budget_shrink_to_none_defers_step():
    sched, oracle = make_sched(oracle=FakeOracle(free_pages=1024))
    s = make_seq(prompt_len=256)
    sched.add(s)
    b = sched.schedule()
    assert b is not None
    sched.postprocess(b, np.array([5]))
    s2 = make_seq(prompt_len=256)
    sched.add(s2)
    oracle.free_pages = 1024  # admit ok
    bb = sched.schedule()
    assert bb is not None


# ================================================== decode & preemption


def test_decode_cost_scales_with_dispatch_k():
    """k-token megastep reserves k-token growth per seq."""
    cfg = make_config(decode_steps_per_dispatch=4)
    oracle = FakeOracle(free_pages=7, decode_cost_per_k=True)
    sched, _ = make_sched(cfg, oracle)
    seqs = [make_seq(32, max_tokens=64) for _ in range(3)]
    for s in seqs:
        sched.add(s)
    b = sched.schedule()
    sched.postprocess(b, np.full(3, 5))
    # make two seqs preemptible (no completions yet)
    for s in seqs[1:]:
        s.completion_token_ids.clear()
    oracle.free_pages = 7  # 3 seqs x k=4 = 12 > 7 -> preempt storm
    d = sched.schedule()
    assert d is not None and not d.is_prefill
    assert len(d.seqs) < 3


def test_preemption_storm_until_budget_fits():
    """Multiple victims are evicted in ONE schedule call when needed."""
    oracle = FakeOracle(free_pages=1024, decode_cost_per_k=True)
    sched, _ = make_sched(make_config(decode_steps_per_dispatch=8), oracle)
    seqs = [make_seq(32, max_tokens=64) for _ in range(4)]
    for s in seqs:
        sched.add(s)
    b = sched.schedule()
    # only seqs[0] gets a completion -> others are preemptible
    toks = np.full(4, 5)
    sched.postprocess(b, toks)
    for s in seqs[1:]:
        s.completion_token_ids.clear()
    oracle.free_pages = 8  # fits exactly ONE k=8 decode seq
    d = sched.schedule()
    assert d is not None
    assert sched.num_preemptions >= 2
    assert all(v.status == SeqStatus.WAITING for v in d.preempted)


def test_preemption_victim_is_latest_arrival():
    oracle = FakeOracle(free_pages=1024)
    sched, _ = make_sched(make_config(), oracle)
    a, b, c = make_seq(32), make_seq(32), make_seq(32)
    for s in (a, b, c):
        sched.add(s)
    batch = sched.schedule()
    sched.postprocess(batch, np.full(3, 5))
    # strip completions from b and c (preemptible), keep a's token
    for s in (b, c):
        s.completion_token_ids.clear()
    c.arrival_time = b.arrival_time + 100.0
    oracle.free_pages = 2
    d = sched.schedule()
    assert c in d.preempted  # latest arrival goes first
    assert d.preempted.index(c) == 0


def test_preempted_seq_readmits_and_replays_from_zero():
    oracle = FakeOracle(free_pages=1024)
    sched, _ = make_sched(make_config(), oracle)
    a, b = make_seq(64), make_seq(64)
    sched.add(a)
    sched.add(b)
    batch = sched.schedule()
    sched.postprocess(batch, np.full(2, 5))
    b.completion_token_ids.clear()
    oracle.free_pages = 1
    d = sched.schedule()
    assert b in d.preempted
    assert b.num_prefilled_tokens == 0 and b.row == -1
    assert b.seq_id in oracle.freed
    oracle.free_pages = 1024
    nxt = sched.schedule()
    assert nxt.is_prefill and b in nxt.seqs
    assert nxt.chunk_sizes[nxt.seqs.index(b)] == 64  # full replay


def test_deadlock_diagnostics_enumerate_holders():
    oracle = FakeOracle(free_pages=1024)
    sched, _ = make_sched(make_config(), oracle)
    seqs = [make_seq(32) for _ in range(3)]
    for s in seqs:
        sched.add(s)
    batch = sched.schedule()
    sched.postprocess(batch, np.full(3, 5))  # all have completions
    oracle.free_pages = 0
    with pytest.raises(RuntimeError) as ei:
        sched.schedule()
    msg = str(ei.value)
    assert "free=" in msg and "running=3" in msg
    for s in seqs:
        assert f"seq {s.seq_id}" in msg


def test_decode_preemption_guard_refuses_completed_victims():
    s = make_seq(32)
    s.completion_token_ids.append(5)
    with pytest.raises(RuntimeError, match="decode replay unsupported"):
        s.reset_for_preemption()


def test_decode_respects_max_decoding_seqs_short_first():
    sched, _ = make_sched(make_config(max_decoding_seqs=2))
    seqs = [make_seq(32 * (i + 1), max_tokens=8) for i in range(3)]
    for s in seqs:
        sched.add(s)
    b = sched.schedule()
    sched.postprocess(b, np.full(3, 5))
    d = sched.schedule()
    assert len(d.seqs) == 2
    assert d.seqs == [seqs[0], seqs[1]]  # shortest two


def test_prefill_always_wins_over_decode():
    sched, _ = make_sched()
    a = make_seq(64, max_tokens=8)
    sched.add(a)
    sched.postprocess(sched.schedule(), np.array([5]))
    late = make_seq(64)
    sched.add(late)
    b = sched.schedule()
    assert b.is_prefill and b.seqs == [late]


# ================================================== postprocess edges


def test_prefill_midchunk_emits_no_token():
    sched, _ = make_sched(make_config(chunk_prefill_size=64))
    s = make_seq(prompt_len=150)
    sched.add(s)
    b = sched.schedule()
    sched.postprocess(b, np.array([5]))
    assert s.completion_token_ids == []
    assert s.status == SeqStatus.PREFILLING
    assert s.last_step_tokens == []


def test_megastep_row_finish_discards_tail_tokens():
    sched, _ = make_sched()
    s = make_seq(32, max_tokens=100)
    sched.add(s)
    sched.postprocess(sched.schedule(), np.array([5]))
    d = sched.schedule()
    done = sched.postprocess(d, np.array([[7, 2, 9, 9]]))  # eos at j=1
    assert done == [s]
    assert s.completion_token_ids == [5, 7, 2]
    assert s.finish_reason == FinishReason.STOP


def test_stop_token_ids_finish_like_eos():
    sched, _ = make_sched(eos=())
    s = make_seq(32, max_tokens=100, stop_token_ids=[17])
    sched.add(s)
    sched.postprocess(sched.schedule(), np.array([5]))
    done = sched.postprocess(sched.schedule(), np.array([[17]]))
    assert done == [s] and s.finish_reason == FinishReason.STOP


def test_ignore_eos_runs_to_max_tokens():
    sched, _ = make_sched()
    s = make_seq(32, max_tokens=3, ignore_eos=True)
    sched.add(s)
    sched.postprocess(sched.schedule(), np.array([2]))  # eos ignored
    assert s.status == SeqStatus.DECODING
    done = sched.postprocess(sched.schedule(), np.array([[2, 2, 2, 2]]))
    assert done == [s] and s.finish_reason == FinishReason.LENGTH
    assert s.num_completion_tokens == 3


def test_max_model_len_caps_generation():
    sched, _ = make_sched(make_config(max_model_len=40))
    s = make_seq(32, max_tokens=1000, ignore_eos=True)
    sched.add(s)
    sched.postprocess(sched.schedule(), np.array([5]))
    done = sched.postprocess(sched.schedule(),
                             np.array([[5] * 16]))
    assert done == [s] and s.finish_reason == FinishReason.LENGTH
    assert s.num_tokens == 40


def test_finished_seq_leaves_running_and_frees_nothing_here():
    """postprocess removes finished seqs from running but does NOT free
    KV (the engine frees after the step; reference llm_engine.py:689-704)."""
    sched, oracle = make_sched()
    s = make_seq(32, max_tokens=1)
    sched.add(s)
    sched.postprocess(sched.schedule(), np.array([5]))
    assert s not in sched.running
    assert oracle.freed == []


def test_prefill_logprobs_scalar_rows():
    sched, _ = make_sched()
    s = make_seq(32, max_tokens=8, logprobs=2)
    sched.add(s)
    b = sched.schedule()
    lps = {
        "lp": np.array([-0.5]),
        "top_ids": np.array([[7, 8]]),
        "top_lps": np.array([[-0.5, -1.5]]),
    }
    sched.postprocess(b, np.array([7]), logprobs=lps)
    assert s.completion_logprobs == [-0.5]
    assert s.completion_top_logprobs == [{7: -0.5, 8: -1.5}]


def test_decode_megastep_logprobs_per_token():
    sched, _ = make_sched()
    s = make_seq(32, max_tokens=8, logprobs=1)
    sched.add(s)
    sched.postprocess(sched.schedule(), np.array([5]), logprobs={
        "lp": np.array([-0.1]), "top_ids": np.array([[5]]),
        "top_lps": np.array([[-0.1]])})
    d = sched.schedule()
    lps = {
        "lp": np.array([[-0.2, -0.3]]),
        "top_ids": np.array([[[4], [6]]]),
        "top_lps": np.array([[[-0.2], [-0.3]]]),
    }
    sched.postprocess(d, np.array([[4, 6]]), logprobs=lps)
    assert s.completion_logprobs == [-0.1, -0.2, -0.3]
    assert s.completion_top_logprobs[-1] == {6: -0.3}


def test_logprobs_not_attached_without_request():
    sched, _ = make_sched()
    s = make_seq(32, max_tokens=8)  # no logprobs requested
    sched.add(s)
    b = sched.schedule()
    sched.postprocess(b, np.array([5]), logprobs={
        "lp": np.array([-0.5]), "top_ids": np.array([[7]]),
        "top_lps": np.array([[-0.5]])})
    assert s.completion_logprobs == []


# ================================================== abort matrix


def test_abort_missing_id_returns_none():
    sched, _ = make_sched()
    assert sched.abort(999999) is None


def test_abort_running_mid_prefill():
    sched, _ = make_sched(make_config(chunk_prefill_size=64))
    s = make_seq(prompt_len=200)
    sched.add(s)
    sched.postprocess(sched.schedule(), np.array([5]))
    got = sched.abort(s.seq_id)
    assert got is s and s.status == SeqStatus.ABORTED
    assert s.finish_reason == FinishReason.ABORT
    assert s not in sched.running
    assert sched.schedule() is None


def test_has_work_transitions():
    sched, _ = make_sched()
    assert not sched.has_work
    s = make_seq(32, max_tokens=1)
    sched.add(s)
    assert sched.has_work
    sched.postprocess(sched.schedule(), np.array([5]))
    assert not sched.has_work  # finished at max_tokens=1
