"""Sequence state-machine unit tests (reference engine/sequence.py:16-149).

Pins the kv_change_state lifecycle the cache managers key off and the
preemption-replay guard.
"""

import pytest

from sparsevllm_tpu.engine.sequence import FinishReason, SeqStatus, Sequence
from sparsevllm_tpu.sampling_params import SamplingParams


def _seq(n=10, **kw):
    return Sequence(list(range(n)), SamplingParams(**kw))


def test_kv_change_state_lifecycle():
    s = _seq(8)
    assert s.kv_change_state == "first_prefill"
    s.num_prefilled_tokens = 4
    assert s.kv_change_state == "prefill"
    s.num_prefilled_tokens = 8
    assert s.kv_change_state == "decode"
    assert s.prefill_done


def test_token_counters():
    s = _seq(5)
    s.completion_token_ids.extend([7, 8])
    assert s.num_prompt_tokens == 5
    assert s.num_completion_tokens == 2
    assert s.num_tokens == 7
    s.num_prefilled_tokens = 3
    assert s.remaining_prefill == 2


def test_next_chunk_tokens_slices_prompt():
    s = _seq(10)
    assert s.next_chunk_tokens(3, 4) == [3, 4, 5, 6]
    assert s.next_chunk_tokens(8, 100) == [8, 9]  # clamps at prompt end


def test_preemption_resets_prefill_progress_and_row():
    s = _seq(6)
    s.num_prefilled_tokens = 6
    s.row = 3
    s.reset_for_preemption()
    assert s.num_prefilled_tokens == 0
    assert s.row == -1
    assert s.status == SeqStatus.PREEMPTED
    assert s.kv_change_state == "first_prefill"


def test_preemption_after_decode_tokens_is_rejected():
    s = _seq(4)
    s.num_prefilled_tokens = 4
    s.completion_token_ids.append(42)
    with pytest.raises(RuntimeError, match="cannot preempt"):
        s.reset_for_preemption()


def test_is_finished_covers_terminal_states():
    s = _seq()
    assert not s.is_finished
    s.status = SeqStatus.FINISHED
    s.finish_reason = FinishReason.STOP
    assert s.is_finished
    s.status = SeqStatus.ABORTED
    assert s.is_finished
    s.status = SeqStatus.DECODING
    assert not s.is_finished


def test_seq_ids_are_unique_and_monotonic():
    a, b = _seq(), _seq()
    assert b.seq_id > a.seq_id
