"""RKV manager: SnapKV prefill eviction + periodic decode-time joint eviction.

Reference counterpart: engine/cache_manager/rkv.py (SnapKV subclass; decode
query cache :132, periodic joint eviction every rkv_compression_interval
generated tokens :333-723 combining attention scores from cached queries and
key-redundancy penalties, physical free via free_part_slots_batch_layers).

TPU flow: the executor owns the device query ring buffer (ops/rkv.py) and
records decode queries in-scan; this manager decides WHEN a sequence is due
(interval + over budget), pre-plans destination pages, and the executor runs
one jitted score+compact op (retention scores -> ordered top-k gather into
fresh pages, engine/executor.py). Eviction is compaction.
"""

from __future__ import annotations

import numpy as np

from .snapkv import SnapKVManager
from ..sequence import Sequence


class RKVManager(SnapKVManager):
    def __init__(self, config, num_kv_layers, num_pages, max_rows):
        super().__init__(config, num_kv_layers, num_pages, max_rows)
        self.interval = config.rkv_compression_interval
        # decode retention budget: kept middle + sink + recent window
        self.decode_budget = (
            config.decode_keep_tokens
            + config.num_sink_tokens
            + config.num_recent_tokens
        )
        self._last_evict_len: dict[int, int] = {}

    def free_seq(self, seq: Sequence) -> None:
        self._last_evict_len.pop(seq.seq_id, None)
        super().free_seq(seq)

    def _due(self, seq: Sequence) -> bool:
        row = self.seq_rows.get(seq.seq_id)
        if row is None or not seq.prefill_done:
            return False
        length = int(self.row_lens[0, row])
        last = self._last_evict_len.get(seq.seq_id, 0)
        return (
            length > self.decode_budget
            and seq.num_completion_tokens - last >= self.interval
        )

    def plan_decode_eviction(self, seqs: list[Sequence]) -> dict | None:
        """Plan a joint eviction for due sequences; returns the compaction
        plan (executor computes retention scores and compacts) or None."""
        due = [s for s in seqs if self._due(s)]
        if not due:
            return None
        b = len(due)
        rows = self.rows_of(due)
        ctx = self.row_lens[0, rows].astype(np.int64)  # layers in lockstep
        keep = np.minimum(
            np.full((self.L, b), self.decode_budget, np.int64), ctx[None, :]
        )
        mpk = int(-(-keep.max() // self.P))
        new_pages = np.zeros((self.L, b, mpk), np.int32)
        for l in range(self.L):
            for j in range(b):
                n = int(-(-keep[l, j] // self.P))
                new_pages[l, j, :n] = self._pop_pages(l, n)
        for s in due:
            self._last_evict_len[s.seq_id] = s.num_completion_tokens
        self.num_decode_evictions = getattr(
            self, "num_decode_evictions", 0
        ) + 1
        return {
            "seqs": due,
            "rows": rows,
            "ctx": ctx.astype(np.int32),
            "keep": keep.astype(np.int32),
            "new_pages": new_pages,
            # always-kept tail (reference keeps the recent window; the
            # compact op's obs_window IS the forced tail)
            "obs_window": self.config.num_recent_tokens,
        }
