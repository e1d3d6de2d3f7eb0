"""Scheduler: continuous batching with chunked prefill.

Re-expresses reference engine/scheduler.py:307-709:
  * no prefill/decode mixing within a step (:312), prefill-first;
  * long/short bucketing — long prompts (remaining > chunk size) are
    scheduled alone at bs=1 (:62-77, long_bs1full policy);
  * admission via MemoryOracle budgets with defer-or-raise
    (`prompt_admission_failure_action`, :416-504);
  * final-chunk floor for observation-window methods
    (min_final_prefill_chunk_size, snapkv.py:401);
  * decode preemption that refuses victims with generated tokens
    (decode replay unsupported, :260-276) and loud deadlock diagnostics
    (:588-658).

TPU adaptation: prefill batches are padded [B, S] (S = max selected chunk),
so the token budget is accounted as B·S — the padded cost is the real cost on
TPU. The scheduler groups similar chunk sizes to bound padding waste.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import numpy as np

from ..config import Config
from ..utils.log import logger
from .kv_manager.base import KVCacheManager
from .sequence import FinishReason, SeqStatus, Sequence


@dataclass
class ScheduledBatch:
    seqs: list[Sequence]
    is_prefill: bool
    chunk_sizes: list[int] = field(default_factory=list)  # prefill only
    preempted: list[Sequence] = field(default_factory=list)

    @property
    def batch_size(self) -> int:
        return len(self.seqs)


class Scheduler:
    def __init__(self, config: Config, kv_manager: KVCacheManager,
                 eos_token_ids: tuple[int, ...] = ()):
        self.config = config
        self.kv = kv_manager
        self.profile = config.method_profile
        self.eos_token_ids = set(eos_token_ids)
        self.waiting: deque[Sequence] = deque()
        self.running: list[Sequence] = []
        self.num_preemptions = 0
        # long/short threshold (reference scheduler.py:62-77): under
        # long_bs1full the threshold is the chunk size.
        self._long_threshold = config.chunk_prefill_size

    # ------------------------------------------------------------- requests

    def add(self, seq: Sequence) -> None:
        if seq.num_prompt_tokens >= self.config.max_model_len:
            raise ValueError(
                f"prompt length {seq.num_prompt_tokens} >= max_model_len "
                f"{self.config.max_model_len}"
            )
        # long prompts route to the host-archive streamed prefill
        # (reference long_bs1full + RawKV offload, scheduler.py:171-221):
        # the device never holds the whole prompt's KV, so admission only
        # reserves the compacted keep budget. Applies to methods whose
        # decode residency is bounded by prefill-end compaction.
        # staged mixed-precision prefill (kv_staging_dtype): long prompts
        # prefill into the quantized staging pool; takes precedence over
        # the host-archive streamed path (staging reads at HBM speed).
        if seq.mm_features is not None:
            # multimodal splice is implemented on the standard resident
            # prefill path only; vision prompts are short (subtitles +
            # patch rows), never long enough for staging/streaming.
            thr_mm = getattr(
                self.config, "long_prefill_offload_threshold", 0)
            if thr_mm and seq.num_prompt_tokens > thr_mm:
                raise ValueError(
                    "multimodal prompts must prefill resident: prompt of "
                    f"{seq.num_prompt_tokens} tokens exceeds "
                    f"long_prefill_offload_threshold={thr_mm}"
                )
            self.waiting.append(seq)
            return
        if hasattr(self.kv, "wants_staging") and self.kv.wants_staging(seq):
            seq.staged_prefill = True
            self.waiting.append(seq)
            return
        thr = getattr(self.config, "long_prefill_offload_threshold", 0)
        if (
            thr
            and seq.num_prompt_tokens > thr
            and getattr(self.config, "method", "")
            in ("snapkv", "pyramidkv", "deltakv")
        ):
            # Residency-aware routing: the archive path's H2D re-stream
            # costs ~ctx^2/(2*chunk) tokens of host-link traffic, while the
            # resident paged-kernel prefill reads KV at HBM speed — so
            # stream ONLY when dense admission can never fit the pool
            # (e.g. bf16 256K). With a quantized cache a 128K prompt fits
            # a 16 GiB chip and takes the fast path (deferred admission
            # drains the pool one long prompt at a time, long_bs1full).
            seq.streamed_prefill = False  # probe the DENSE admission cost
            dense_cost = self.kv.admission_cost_pages(seq)
            seq.streamed_prefill = dense_cost > self.kv.num_pages - 1
        self.waiting.append(seq)

    def abort(self, seq_id: int) -> Sequence | None:
        for i, seq in enumerate(self.waiting):
            if seq.seq_id == seq_id:
                del self.waiting[i]
                seq.status = SeqStatus.ABORTED
                seq.finish_reason = FinishReason.ABORT
                return seq
        for i, seq in enumerate(self.running):
            if seq.seq_id == seq_id:
                del self.running[i]
                seq.status = SeqStatus.ABORTED
                seq.finish_reason = FinishReason.ABORT
                return seq
        return None

    @property
    def has_work(self) -> bool:
        return bool(self.waiting or self.running)

    # ------------------------------------------------------------- schedule

    def schedule(self) -> ScheduledBatch | None:
        batch = self._schedule_prefill()
        if batch is not None and batch.seqs:
            return batch
        return self._schedule_decode()

    def _chunk_for(self, seq: Sequence) -> int:
        """Next prefill chunk size, honoring the final-chunk observation
        floor for score-collecting methods."""
        remaining = seq.remaining_prefill
        chunk = min(remaining, self.config.chunk_prefill_size)
        if self.profile.needs_prefill_scores:
            w = self.config.snapkv_obs_window
            leftover = remaining - chunk
            if 0 < leftover < w:
                chunk = max(remaining - w, 1)
        return chunk

    def _schedule_prefill(self) -> ScheduledBatch | None:
        # in-progress prefills first, then admit from waiting.
        candidates = [
            s for s in self.running if not s.prefill_done
        ]
        admitted: list[Sequence] = []
        while self.waiting:
            seq = self.waiting[0]
            if (len(candidates) + len(admitted)
                    >= self.config.max_num_seqs_in_batch):
                break
            if not self.kv.can_admit(seq):
                if not candidates and not admitted and not self.running:
                    if self.config.prompt_admission_failure_action == "raise":
                        raise RuntimeError(
                            f"seq {seq.seq_id} (prompt "
                            f"{seq.num_prompt_tokens}) cannot be admitted "
                            f"into an empty engine: needs "
                            f"{self.kv.admission_cost_pages(seq)} pages, "
                            f"{self.kv.num_free_pages()} free. "
                            f"Increase KV memory or reduce max_model_len."
                        )
                    logger.warning(
                        "seq %s deferred on empty engine: needs %d pages, "
                        "%d free (will retry; raise instead via "
                        "prompt_admission_failure_action='raise')",
                        seq.seq_id, self.kv.admission_cost_pages(seq),
                        self.kv.num_free_pages(),
                    )
                break
            self.waiting.popleft()
            self.kv.alloc_row(seq)
            matched = self.kv.try_attach_prefix(seq)
            if matched:
                seq.num_prefilled_tokens = matched
            seq.status = SeqStatus.PREFILLING
            admitted.append(seq)
        candidates.extend(admitted)
        self.running.extend(admitted)
        if not candidates:
            return None

        # long prompts run alone (long_bs1full behavior for methods that
        # default to it; all_chunked still isolates >threshold prompts to
        # bound padding waste, which is the TPU analogue of the reference's
        # long/short split).
        # staged sequences always count as long: the staged step fn is
        # compiled for bs=1 and its scratch is sized for one sequence.
        longs = [s for s in candidates
                 if s.remaining_prefill > self._long_threshold
                 or s.staged_prefill]
        shorts = [s for s in candidates
                  if s.remaining_prefill <= self._long_threshold
                  and not s.staged_prefill]
        if longs and not shorts:
            selected = [longs[0]]
        elif shorts:
            # group similar chunk sizes: sort descending by next chunk.
            shorts.sort(key=lambda s: -self._chunk_for(s))
            selected = []
            s_pad = 0
            for seq in shorts:
                c = self._chunk_for(seq)
                new_pad = max(s_pad, c)
                if (len(selected) + 1) * new_pad > self.config.max_num_batched_tokens:
                    break
                if len(selected) >= self.config.max_num_seqs_in_batch:
                    break
                selected.append(seq)
                s_pad = new_pad
        else:
            selected = [longs[0]]

        chunk_sizes = [self._chunk_for(s) for s in selected]
        # page-budget check for this step; shrink the batch if needed.
        while selected:
            need = sum(
                self.kv.prefill_step_cost_pages(s, c)
                for s, c in zip(selected, chunk_sizes)
            )
            if need <= self.kv.num_free_pages():
                break
            selected.pop()
            chunk_sizes.pop()
        if not selected:
            return None
        return ScheduledBatch(selected, True, chunk_sizes)

    def _schedule_decode(self) -> ScheduledBatch | None:
        decoding = [s for s in self.running if s.status == SeqStatus.DECODING]
        if not decoding:
            return None
        decoding.sort(key=lambda s: s.num_tokens)  # short-first (:528-573)
        selected = decoding[: self.config.max_decoding_seqs]
        k = self.config.decode_steps_per_dispatch
        preempted: list[Sequence] = []
        while selected:
            need = sum(self.kv.decode_step_cost_pages(s, k) for s in selected)
            if need <= self.kv.num_free_pages():
                break
            victim = self._pick_preemption_victim(selected)
            if victim is None:
                self._raise_deadlock(selected)
            self._preempt(victim)
            preempted.append(victim)
            if victim in selected:
                selected.remove(victim)
        if not selected:
            return None
        return ScheduledBatch(selected, False, preempted=preempted)

    def _pick_preemption_victim(self, keep_pool) -> Sequence | None:
        """Last-arrived sequence without generated tokens (reference refuses
        decode replay, scheduler.py:270-276)."""
        cands = [
            s for s in self.running
            if s.num_completion_tokens == 0 and s.status != SeqStatus.WAITING
        ]
        if not cands:
            return None
        return max(cands, key=lambda s: s.arrival_time)

    def _preempt(self, seq: Sequence) -> None:
        self.num_preemptions += 1
        self.running.remove(seq)
        self.kv.free_seq(seq)
        seq.reset_for_preemption()
        seq.status = SeqStatus.WAITING
        self.waiting.append(seq)  # requeue to tail (:260-305)
        logger.warning("preempted seq %s (prefill will replay)", seq.seq_id)

    def _raise_deadlock(self, selected) -> None:
        stats = self.kv.free_slot_stats()
        detail = ", ".join(
            f"seq {s.seq_id}: tokens={s.num_tokens} "
            f"pages={self.kv.seq_resident_pages(s)}"
            for s in selected[:8]
        )
        raise RuntimeError(
            f"decode cannot proceed: no free pages and no preemptible "
            f"victim (all candidates have generated tokens). "
            f"free={stats}, running={len(self.running)}, "
            f"waiting={len(self.waiting)}. [{detail}] "
            f"Reduce max_decoding_seqs or add KV memory."
        )

    # ---------------------------------------------------------- postprocess

    def postprocess(
        self, batch: ScheduledBatch, sampled_tokens, logprobs=None
    ) -> list[Sequence]:
        """Apply step results; returns newly finished sequences (reference
        scheduler.py:665-709).

        ``sampled_tokens`` is [B] (prefill) or [B, k] (decode megastep); a
        sequence finishing at step t < k discards the remaining tokens.
        ``logprobs`` (optional) is the executor's last_logprobs dict with
        "lp" [B(,k)], "top_ids"/"top_lps" [B(,k),N]; entries are attached to
        sequences whose sampling params request logprobs.
        """
        finished: list[Sequence] = []
        for i, seq in enumerate(batch.seqs):
            seq.last_step_tokens = []
            if batch.is_prefill:
                seq.num_prefilled_tokens += batch.chunk_sizes[i]
                if not seq.prefill_done:
                    continue
                seq.status = SeqStatus.DECODING
                step_tokens = [int(sampled_tokens[i])]
            else:
                row = sampled_tokens[i]
                step_tokens = [int(t) for t in np.atleast_1d(row)]
            want_lp = (
                logprobs is not None
                and seq.sampling_params.logprobs is not None
            )
            for j, token in enumerate(step_tokens):
                seq.completion_token_ids.append(token)
                seq.last_step_tokens.append(token)
                if want_lp:
                    lp_row = logprobs["lp"][i]
                    ids_row = logprobs["top_ids"][i]
                    lps_row = logprobs["top_lps"][i]
                    if lp_row.ndim:  # decode megastep: [k] / [k, N]
                        lp_j, ids_j, lps_j = (
                            lp_row[j], ids_row[j], lps_row[j]
                        )
                    else:  # prefill: scalar / [N]
                        lp_j, ids_j, lps_j = lp_row, ids_row, lps_row
                    n = seq.sampling_params.logprobs
                    seq.completion_logprobs.append(float(lp_j))
                    seq.completion_top_logprobs.append({
                        int(t): float(v)
                        for t, v in zip(ids_j[:n], lps_j[:n])
                    })
                if self._check_finish(seq, token):
                    finished.append(seq)
                    break
        for seq in finished:
            self.running.remove(seq)
        return finished

    def _check_finish(self, seq: Sequence, token: int) -> bool:
        sp = seq.sampling_params
        if not sp.ignore_eos and (
            token in self.eos_token_ids or token in sp.stop_token_ids
        ):
            seq.status = SeqStatus.FINISHED
            seq.finish_reason = FinishReason.STOP
            return True
        if seq.num_completion_tokens >= sp.max_tokens:
            seq.status = SeqStatus.FINISHED
            seq.finish_reason = FinishReason.LENGTH
            return True
        if seq.num_tokens >= self.config.max_model_len:
            seq.status = SeqStatus.FINISHED
            seq.finish_reason = FinishReason.LENGTH
            return True
        return False
