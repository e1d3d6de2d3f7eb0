"""StreamingLLM (attention-sink) manager: sink + recent-window retention.

Reference counterpart: engine/cache_manager/streamingllm.py:10-60
(free_prefix_recent_slots_batch_layers physically frees all but sink+recent).

TPU-first twist: because storage is page-granular and eviction here always
drops a *contiguous middle range*, eviction is a pure **page-table edit** —
zero KV bytes move. The kept pages stay where they are; the host splices the
middle pages out of the table, shrinks the row length, frees the pages, and
queues a row rewrite for the device table. Budgets therefore round to page
multiples (documented deviation: up to 2·page_size-1 extra tokens retained vs
the reference's token-granular window).

Stored K is post-RoPE with original absolute positions, matching the
reference (which inherits SnapKV storage and does not re-roll positions).
"""

from __future__ import annotations

import numpy as np

from .base import KVCacheManager
from ..sequence import Sequence


class StreamingLLMKVManager(KVCacheManager):
    def __init__(self, config, num_kv_layers, num_pages, max_rows):
        super().__init__(config, num_kv_layers, num_pages, max_rows)
        self.sink_pages = -(-config.num_sink_tokens // self.P)
        self.recent_tokens = config.num_recent_tokens

    # window + one chunk is the admission peak (reference streamingllm
    # overrides prefill margin, streamingllm.py:24-33).
    def admission_cost_pages(self, seq: Sequence) -> int:
        peak_tokens = min(
            seq.num_prompt_tokens + 1,
            self.sink_pages * self.P
            + self.recent_tokens
            + self.config.chunk_prefill_size
            + self.P,
        )
        return -(-peak_tokens // self.P)

    def _evict_row(self, row: int) -> bool:
        """Drop middle pages of a row across all layers. Returns True if
        anything was evicted."""
        length = int(self.row_lens[0, row])
        # first page that contains a token of the recent window
        first_keep = (length - self.recent_tokens) // self.P
        if first_keep <= self.sink_pages:
            return False
        n_pages = -(-length // self.P)
        drop = first_keep - self.sink_pages
        for l in range(self.L):
            table = self.page_tables[l, row]
            dropped = table[self.sink_pages : first_keep].copy()
            kept_tail = table[first_keep:n_pages].copy()
            table[self.sink_pages : self.sink_pages + len(kept_tail)] = kept_tail
            self._release_pages(l, dropped)
            n_after = self.sink_pages + len(kept_tail)
            idx = np.arange(n_after)
            self._queue_update(
                np.full(n_after, l), np.full(n_after, row), idx, table[:n_after]
            )
        self.row_lens[:, row] = length - drop * self.P
        return True

    def on_prefill_chunk_end(self, seqs: list[Sequence], final: bool) -> list:
        for seq in seqs:
            row = self.seq_rows.get(seq.seq_id)
            if row is not None:
                self._evict_row(row)
        return []

    def on_decode_step_end(self, seqs: list[Sequence]) -> list:
        for seq in seqs:
            row = self.seq_rows.get(seq.seq_id)
            if row is not None:
                self._evict_row(row)
        return []
