"""SnapKV / PyramidKV manager: prefill-end top-k eviction with per-layer state.

Reference counterpart: engine/cache_manager/snapkv.py (fully per-layer slot
state because eviction leaves different layer lengths, snapkv.py:46-58; prefill
attention-score accumulators fed by the prefill_score kernel :509-651) plus
the SparseController eviction executors (_snapkv_prefill_eviction
sparse_controller.py:631-665, pyramid per-layer budgets :1449-1462).

TPU-first flow (graph-stable, no host sync on scores):
  1. The executor's prefill step emits observation-window scores [L, B, K]
     as a scan output (obs window must fit the final chunk, enforced in
     Config — mirrors min_final_prefill_chunk_size, snapkv.py:401).
  2. When a sequence finishes prefill, this manager *pre-plans* the
     compaction entirely host-side: keep counts are deterministic
     (min(budget_l, ctx)), so new pages are allocated without reading any
     device data.
  3. The executor runs one jitted compact op: per (layer, row) top-k over the
     scores -> ordered kept positions -> gather KV from old pages -> scatter
     into the new pages -> rewrite device table rows.
  4. The manager commits: frees old pages, updates host tables/lens.

PyramidKV = same machinery with arithmetic-decay per-layer budgets
(pyramid beta): budget_l = max_b - l·(max_b-min_b)/(L-1), min_b = keep/beta,
max_b = 2·keep - min_b (sum over layers ≈ L·keep).
"""

from __future__ import annotations

import numpy as np

from .base import KVCacheManager
from ..sequence import Sequence


class SnapKVManager(KVCacheManager):
    def __init__(self, config, num_kv_layers, num_pages, max_rows):
        super().__init__(config, num_kv_layers, num_pages, max_rows)
        keep = config.prefill_keep_tokens
        self.obs_window = config.snapkv_obs_window
        if config.method == "pyramidkv":
            l = max(num_kv_layers - 1, 1)
            min_b = max(keep // config.pyramidkv_beta, self.obs_window)
            max_b = 2 * keep - min_b
            budgets = [
                int(round(max_b - i * (max_b - min_b) / l))
                for i in range(num_kv_layers)
            ]
        else:
            budgets = [keep] * num_kv_layers
        # budget always covers the forced observation window.
        self.layer_budgets = np.asarray(
            [max(b, self.obs_window) for b in budgets], np.int64
        )

    # admission peak: whole prompt resident + compaction destination pages
    # (new pages are allocated before old ones are freed). Streamed long
    # prefills (host KV archive, engine/streamed_prefill.py) never hold the
    # prompt in device pages — only the compacted keep budget.
    def admission_cost_pages(self, seq: Sequence) -> int:
        keep_pages = -(-int(self.layer_budgets.max()) // self.P)
        if getattr(seq, "streamed_prefill", False):
            return keep_pages + 1
        prompt_pages = -(-(seq.num_prompt_tokens + 1) // self.P)
        return prompt_pages + keep_pages

    def prefill_step_cost_pages(self, seq: Sequence, chunk: int) -> int:
        if getattr(seq, "streamed_prefill", False):
            return 0  # chunk KV lives in activations + the host archive
        return super().prefill_step_cost_pages(seq, chunk)

    def plan_compaction(self, seqs: list[Sequence]) -> dict | None:
        """Pre-plan prefill-end eviction for sequences that just finished
        prefill. Returns None when no layer of any seq exceeds its budget."""
        b = len(seqs)
        rows = self.rows_of(seqs)
        ctx = np.asarray([s.num_prompt_tokens for s in seqs], np.int64)  # [B]
        keep = np.minimum(self.layer_budgets[:, None], ctx[None, :])  # [L,B]
        if np.all(keep >= ctx[None, :]):
            return None
        mpk = int(-(-keep.max() // self.P))
        new_pages = np.zeros((self.L, b, mpk), np.int32)
        for l in range(self.L):
            for j in range(b):
                n = int(-(-keep[l, j] // self.P))
                new_pages[l, j, :n] = self._pop_pages(l, n)
        return {
            "rows": rows,
            "ctx": ctx.astype(np.int32),
            "keep": keep.astype(np.int32),
            "new_pages": new_pages,
            "obs_window": self.obs_window,
        }

    # ---------------------------------------------- streamed-prefill adoption

    def plan_streamed_adoption(self, seq: Sequence, keep: "np.ndarray"):
        """Allocate destination pages for a streamed sequence's compacted
        rows (keep[l] tokens per layer); the executor scatters archived KV
        into them (streamed_prefill.py _compact_and_sample)."""
        new_pages = []
        for l in range(self.L):
            n = int(-(-int(keep[l]) // self.P))
            new_pages.append(self._pop_pages(l, n))
        return {"keep": keep, "new_pages": new_pages}

    def commit_streamed_adoption(self, seq: Sequence, plan: dict) -> None:
        row = self.seq_rows[seq.seq_id]
        if int(self.row_lens[:, row].max()) != 0:
            raise AssertionError(
                "streamed sequence unexpectedly holds device pages"
            )
        for l in range(self.L):
            pages = plan["new_pages"][l]
            n = len(pages)
            self.page_tables[l, row, :n] = pages
            self.row_lens[l, row] = int(plan["keep"][l])
            self._queue_update(
                np.full(n, l), np.full(n, row), np.arange(n), pages
            )

    def commit_compaction(self, seqs: list[Sequence], plan: dict) -> None:
        """Free old pages, adopt the new tables host-side (the device rows
        were rewritten by the executor's compact op)."""
        keep = plan["keep"]
        new_pages = plan["new_pages"]
        for j, seq in enumerate(seqs):
            row = self.seq_rows[seq.seq_id]
            for l in range(self.L):
                old_n = int(-(-self.row_lens[l, row] // self.P))
                self._release_pages(l, self.page_tables[l, row, :old_n].copy())
                n = int(-(-keep[l, j] // self.P))
                self.page_tables[l, row, :n] = new_pages[l, j, :n]
                self.row_lens[l, row] = keep[l, j]
