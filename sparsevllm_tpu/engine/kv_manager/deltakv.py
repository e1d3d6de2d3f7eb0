"""DeltaKV manager: full layers dense, sparse layers compressed at prefill end.

Reference counterpart: engine/cache_manager/deltakv_base.py +
deltakv_less_memory.py (layer split full/sparse :91-95; raw pools + latent
pools + per-pool slot maps :128-157; admission reserves centers/latents
:1042-1115). The TPU build keeps BOTH layer families in the one paged pool:

  * full layers: dense rows forever (observation layers for top-k selection).
  * sparse layers: dense during prefill; at prefill end the executor runs the
    compression op (ops/deltakv.py) over the middle region
    [sink_pages*P, floor((prompt-recent)/P)*P), then this manager splices the
    compressed pages out of the SPARSE layers' tables (pure table edit, like
    streamingllm) — latents/centers live in executor device state.
  * decode tokens append to the sparse rows raw (the growing recent tail);
    periodic re-compression is staged for a later round.
"""

from __future__ import annotations

import numpy as np

from .base import KVCacheManager
from ..sequence import Sequence


class DeltaKVManager(KVCacheManager):
    def __init__(self, config, num_kv_layers, num_pages, max_rows):
        super().__init__(config, num_kv_layers, num_pages, max_rows)
        # hybrid models: the engine pre-maps full_attn_layers (model-layer
        # indices) to KV SLOTS and stores them on the config
        # (llm_engine.py; reference RuntimeLayout.layer_idx_to_kv_idx)
        slots = getattr(config, "full_attn_kv_slots", None)
        self.full_layers = sorted(set(
            slots if slots is not None else config.full_attn_layers
        ))
        self.sparse_layers = [
            i for i in range(num_kv_layers) if i not in self.full_layers
        ]
        self.sink_pages = -(-config.num_sink_tokens // self.P)
        self.recent_tokens = config.num_recent_tokens
        self.stride = max(int(round(1.0 / config.deltakv_cluster_ratio)), 1)
        self.cmax = config.deltakv_max_compressed_tokens
        # per-seq compressed-token count (same across sparse layers)
        self.comp_counts: dict[int, int] = {}

    @property
    def comp_base(self) -> int:
        """Absolute position of compressed token 0 (page-aligned sink)."""
        return self.sink_pages * self.P

    def free_seq(self, seq: Sequence) -> None:
        self.comp_counts.pop(seq.seq_id, None)
        super().free_seq(seq)

    # ------------------------------------------------------------ compression

    def compressible_tokens(self, seq: Sequence) -> int:
        """Middle-region length, lcm(page, stride)-aligned: pages splice
        whole, and a later tail re-compression resumes on a cluster
        boundary (dest_offset % stride == 0)."""
        align = int(np.lcm(self.P, self.stride))
        end_page = (seq.num_prompt_tokens - self.recent_tokens) // self.P
        raw = max((end_page - self.sink_pages) * self.P, 0)
        return (raw // align) * align

    def admission_cost_pages(self, seq: Sequence) -> int:
        if self.compressible_tokens(seq) > self.cmax:
            raise ValueError(
                f"prompt {seq.num_prompt_tokens}: compressible region "
                f"{self.compressible_tokens(seq)} exceeds "
                f"deltakv_max_compressed_tokens={self.cmax}"
            )
        if getattr(seq, "streamed_prefill", False):
            # host-archive long prefill (reference raw_kv_offload.py
            # full-prefill plan, deltakv_base.py:305-399): the device ends
            # up holding the FULL layers' dense rows (observation layers)
            # plus the sparse layers' sink+recent raw — the middle region
            # lives in latents/centers, not pages. Peak = full-layer rows.
            per_layer = -(-(seq.num_prompt_tokens + 1) // self.P) + 2
            if self.GP:
                # global pool: only the FULL layers pay the prompt; the
                # sparse layers pay sink + recent + slack. This asymmetry
                # is exactly why deltakv wants global_kv_pool — a
                # per-layer pool must size EVERY layer at the full-layer
                # demand (256K: ~8 GiB wasted on a 16 GiB chip).

                sparse_cost = (
                    self.sink_pages + -(-self.recent_tokens // self.P) + 2
                )
                return (len(self.full_layers) * per_layer
                        + len(self.sparse_layers) * sparse_cost)
            return per_layer
        # dense prefill peak (whole prompt resident on every layer)
        return super().admission_cost_pages(seq)

    def prefill_step_cost_pages(self, seq: Sequence, chunk: int) -> int:
        if getattr(seq, "streamed_prefill", False):
            return 0  # chunk KV lives in the host archive
        return super().prefill_step_cost_pages(seq, chunk)

    def plan_compression(self, seqs: list[Sequence]) -> dict | None:
        """Executor-facing plan for prefill-end compression."""
        todo = [
            s for s in seqs
            if s.seq_id not in self.comp_counts
            and self.compressible_tokens(s) > 0
        ]
        if not todo:
            return None
        counts = np.asarray(
            [self.compressible_tokens(s) for s in todo], np.int32
        )
        return {
            "seqs": todo,
            "rows": self.rows_of(todo),
            "counts": counts,
            "comp_base": self.comp_base,
            "stride": self.stride,
        }

    def _splice_compressed(self, row: int, count: int) -> None:
        """Drop ``count`` (page-aligned) tokens' pages at the sink boundary
        of every sparse layer; the tail slides down (pure table edit)."""
        first_kept = self.sink_pages + count // self.P
        n_pages = int(-(-self.row_lens[self.sparse_layers[0], row]
                        // self.P))
        for l in self.sparse_layers:
            table = self.page_tables[l, row]
            dropped = table[self.sink_pages:first_kept].copy()
            tail = table[first_kept:n_pages].copy()
            table[self.sink_pages:self.sink_pages + len(tail)] = tail
            self._release_pages(l, dropped)
            n_after = self.sink_pages + len(tail)
            idx = np.arange(n_after)
            self._queue_update(
                np.full(n_after, l), np.full(n_after, row), idx,
                table[:n_after],
            )
            self.row_lens[l, row] -= count

    def commit_compression(self, plan: dict) -> None:
        """Splice compressed pages out of the sparse layers' tables."""
        for j, seq in enumerate(plan["seqs"]):
            row = self.seq_rows[seq.seq_id]
            count = int(plan["counts"][j])
            self.comp_counts[seq.seq_id] = count
            self._splice_compressed(row, count)
        # full layers untouched (observation layers stay dense)

    # -------------------------------------------------- tail re-compression

    def plan_decode_recompression(self, seqs: list[Sequence]) -> dict | None:
        """Periodically fold the growing raw decode tail into latents
        (reference deltakv_less_memory tail handling; VERDICT r1 gap: the
        tail previously grew raw forever, unreachable 512K). A sequence
        re-compresses once its raw tail beyond the recent window reaches
        ``deltakv_recompress_interval`` tokens; the compressed span is
        lcm(page_size, stride)-aligned: whole pages splice out AND cluster
        boundaries stay stride-aligned."""
        interval = self.config.deltakv_recompress_interval
        if not interval:
            return None
        align = int(np.lcm(self.P, self.stride))
        todo, counts, dest = [], [], []
        sl0 = self.sparse_layers[0]
        for s in seqs:
            if s.seq_id not in self.comp_counts:
                continue  # prompt never compressed (short); tail stays raw
            row = self.seq_rows[s.seq_id]
            tail = int(self.row_lens[sl0, row]) - self.comp_base
            n = ((tail - self.recent_tokens) // align) * align
            if n < interval:
                continue
            have = self.comp_counts[s.seq_id]
            n = min(n, self.cmax - have)
            n = (n // align) * align
            if n <= 0:
                continue
            todo.append(s)
            counts.append(n)
            dest.append(have)
        if not todo:
            return None
        return {
            "seqs": todo,
            "rows": self.rows_of(todo),
            "counts": np.asarray(counts, np.int32),
            "dest_offset": np.asarray(dest, np.int32),
            "comp_base": self.comp_base,
            "stride": self.stride,
        }

    def commit_recompression(self, plan: dict) -> None:
        for j, seq in enumerate(plan["seqs"]):
            row = self.seq_rows[seq.seq_id]
            n = int(plan["counts"][j])
            self.comp_counts[seq.seq_id] += n
            self._splice_compressed(row, n)

    def comp_counts_of(self, seqs: list[Sequence]) -> np.ndarray:
        return np.asarray(
            [self.comp_counts.get(s.seq_id, 0) for s in seqs], np.int32
        )

    # decode step cost: full layers grow like dense; sparse rows also append
    # (handled by base alloc_decode per-layer math).
