"""Request-local sequence state machine.

Re-expresses reference engine/sequence.py:16-149: per-request token counters,
prefill progress, and the kv_change_state lifecycle
{first_prefill -> prefill -> decode} the cache managers key off.
"""

from __future__ import annotations

import enum
import itertools
import time
from dataclasses import dataclass, field

from ..sampling_params import SamplingParams

_seq_counter = itertools.count()


class SeqStatus(enum.Enum):
    WAITING = "waiting"
    PREFILLING = "prefilling"
    DECODING = "decoding"
    PREEMPTED = "preempted"
    FINISHED = "finished"
    ABORTED = "aborted"


class FinishReason(enum.Enum):
    STOP = "stop"  # EOS or stop token
    LENGTH = "length"  # max_tokens or max_model_len
    ABORT = "abort"


@dataclass
class Sequence:
    prompt_token_ids: list[int]
    sampling_params: SamplingParams
    seq_id: int = field(default_factory=lambda: next(_seq_counter))
    request_id: str | None = None
    arrival_time: float = field(default_factory=time.monotonic)

    status: SeqStatus = SeqStatus.WAITING
    num_prefilled_tokens: int = 0
    completion_token_ids: list[int] = field(default_factory=list)
    finish_reason: FinishReason | None = None
    row: int = -1  # KV row assigned by the cache manager; -1 = none
    # tokens newly produced in the current step (for streaming)
    last_step_tokens: list[int] = field(default_factory=list)
    # per-completion-token logprob data (only when sampling_params.logprobs
    # is set; reference model_runner.py:912-945 logprobs RPC)
    completion_logprobs: list[float] = field(default_factory=list)
    completion_top_logprobs: list[dict[int, float]] = field(
        default_factory=list
    )
    # long-prompt prefill routing (set at scheduler.add): host-archive
    # streamed prefill vs quantized staging-pool prefill (kv_staging_dtype)
    streamed_prefill: bool = False
    staged_prefill: bool = False
    # multimodal: projector rows spliced at image-placeholder positions
    # (reference llava_ov_inference.py input-embeds path). mm_features is
    # [n_image_tokens, text_hidden]; mm_positions the prompt indices of the
    # placeholder tokens, in order.
    mm_features: object | None = None  # np.ndarray
    mm_positions: object | None = None  # np.ndarray [n_image_tokens]

    @property
    def num_prompt_tokens(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def num_completion_tokens(self) -> int:
        return len(self.completion_token_ids)

    @property
    def num_tokens(self) -> int:
        return self.num_prompt_tokens + self.num_completion_tokens

    @property
    def remaining_prefill(self) -> int:
        return self.num_prompt_tokens - self.num_prefilled_tokens

    @property
    def prefill_done(self) -> bool:
        return self.num_prefilled_tokens >= self.num_prompt_tokens

    @property
    def kv_change_state(self) -> str:
        """Mirrors reference sequence.py:52-60."""
        if self.num_prefilled_tokens == 0:
            return "first_prefill"
        if not self.prefill_done:
            return "prefill"
        return "decode"

    @property
    def is_finished(self) -> bool:
        return self.status in (SeqStatus.FINISHED, SeqStatus.ABORTED)

    def next_chunk_tokens(self, start: int, size: int) -> list[int]:
        """Prompt tokens [start, start+size) for the next prefill chunk."""
        return self.prompt_token_ids[start : start + size]

    def reset_for_preemption(self) -> None:
        """Requeue after preemption: full prefill replay (reference
        scheduler.py:260-305; decode replay is unsupported, so callers must
        not preempt sequences with completion tokens)."""
        if self.completion_token_ids:
            raise RuntimeError(
                f"seq {self.seq_id}: cannot preempt after generated tokens "
                f"(decode replay unsupported, mirrors reference "
                f"scheduler.py:270-276)"
            )
        self.num_prefilled_tokens = 0
        self.row = -1
        self.status = SeqStatus.PREEMPTED
