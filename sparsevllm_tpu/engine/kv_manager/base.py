"""Paged KV-cache manager (host side).

TPU-first re-design of the reference cache-manager layer
(engine/cache_manager/base.py + standard.py): instead of token-granular slot
pools with per-method view hooks, the TPU build uses **page-granular pools**
(page = `page_size` tokens; one (page, kv_head) tile = one Pallas DMA block)
with:

  * per-layer page free-stacks (vectorized numpy) — per-layer state is what
    lets SnapKV/PyramidKV keep different tokens per layer (reference
    snapkv.py:46-58 "fully per-layer state");
  * a host-side mirror of the per-layer page tables plus an incremental
    update queue that the executor scatters into the persistent **device**
    page-table array before each step (replaces slot_mapping H2D churn);
  * the MemoryOracle budget protocol for the scheduler (reference
    runtime_state.py:14-43).

Methods whose layers stay identical (vanilla/streamingllm during prefill,
omnikv, quest) keep the per-layer stacks in lockstep, so prefill destination
slots are layer-shared; per-layer divergence begins only at method-specific
eviction time (decode plans are per-layer regardless — they are tiny).

The device-side KV payload itself lives in the executor
([L, num_pages, P, Nkv, Dh] arrays); this class owns only identity/bookkeeping
(which page belongs to whom), mirroring the reference split where CacheManager
owns state and kernels own bytes.
"""

from __future__ import annotations

import numpy as np

from ...config import Config
from ...method_registry import get_profile
from ...utils.log import logger
from ..sequence import Sequence


class KVCacheManager:
    """Dense (vanilla) manager; sparse managers subclass."""

    @staticmethod
    def create(config: Config, num_kv_layers: int, num_pages: int,
               max_rows: int) -> "KVCacheManager":
        """Factory routing by method (reference base.py:244-284)."""
        from .standard import StandardKVManager
        from .streamingllm import StreamingLLMKVManager
        from .snapkv import SnapKVManager
        from .quest import QuestKVManager
        from .rkv import RKVManager
        from .skipkv import SkipKVManager
        from .deltakv import DeltaKVManager

        method = config.method
        cls = {
            "": StandardKVManager,
            "omnikv": StandardKVManager,  # storage-identical; selection is
            # logical (reference omnikv.py:9-11)
            "streamingllm": StreamingLLMKVManager,
            "snapkv": SnapKVManager,
            "pyramidkv": SnapKVManager,
            "quest": QuestKVManager,
            "rkv": RKVManager,
            "skipkv": SkipKVManager,
            "deltakv": DeltaKVManager,
        }.get(method)
        if cls is None:
            raise NotImplementedError(
                f"cache manager for method {method!r} not implemented yet"
            )
        return cls(config, num_kv_layers, num_pages, max_rows)

    def __init__(self, config: Config, num_kv_layers: int, num_pages: int,
                 max_rows: int):
        if num_pages < 2:
            raise ValueError("need at least 2 pages (page 0 is reserved)")
        self.config = config
        self.profile = get_profile(config.method)
        self.L = num_kv_layers
        self.P = config.page_size
        self.num_pages = num_pages
        self.max_rows = max_rows
        self.MP = config.max_pages_per_seq

        # global pool (config.global_kv_pool): ONE physical page id space
        # shared by every layer — one free stack, one refcount plane; the
        # per-layer page TABLES below still route each layer to its own
        # pages (reference deltakv_base.py's separate full/sparse pools,
        # generalized). num_pages then means TOTAL pages across layers.
        self.GP = bool(getattr(config, "global_kv_pool", False))
        n_stacks = 1 if self.GP else self.L
        # page 0 reserved as trash page (padded stores/table entries hit it).
        usable = np.arange(num_pages - 1, 0, -1, dtype=np.int32)  # stack
        self._free = np.broadcast_to(usable, (n_stacks, usable.size)).copy()
        self._free_top = np.full(n_stacks, usable.size, dtype=np.int64)
        # per-page reference counts: a page returns to the free stack only at
        # refcount 0 (owner seq + prefix-cache + each attached seq hold one).
        self._page_refs = np.zeros((n_stacks, num_pages), np.int32)

        # block-level radix prefix cache (engine wires the index when
        # config.enable_prefix_cache; block == page, see prefix_cache.py).
        self.prefix_index = None
        self._seq_prefix_blocks: dict[int, list] = {}

        self.page_tables = np.zeros((self.L, max_rows, self.MP), np.int32)
        self.row_lens = np.zeros((self.L, max_rows), np.int64)
        self._free_rows: list[int] = list(range(max_rows - 1, -1, -1))
        self.seq_rows: dict[int, int] = {}

        self._reclaim_cache: int | None = None
        # hybrid joint prefix blocks (engine-installed):
        # filter(blocks) -> usable prefix blocks; attached(seq, blocks)
        # restores recurrent state after a hit
        self.prefix_attach_filter = None
        self.on_prefix_attached = None

        # pending device page-table updates (flushed by the executor).
        self._upd_l: list[np.ndarray] = []
        self._upd_r: list[np.ndarray] = []
        self._upd_i: list[np.ndarray] = []
        self._upd_p: list[np.ndarray] = []

    # ------------------------------------------------------------------ rows

    def alloc_row(self, seq: Sequence) -> int:
        if not self._free_rows:
            raise RuntimeError("no free KV rows")
        row = self._free_rows.pop()
        self.seq_rows[seq.seq_id] = row
        self.row_lens[:, row] = 0
        seq.row = row
        return row

    def free_seq(self, seq: Sequence) -> None:
        row = self.seq_rows.pop(seq.seq_id, None)
        if row is None:
            return
        blocks = self._seq_prefix_blocks.pop(seq.seq_id, None)
        if blocks and self.prefix_index is not None:
            self.prefix_index.release(blocks)
        self._invalidate_reclaim_cache()
        # drop page references (vectorized over layers).
        for l in range(self.L):
            n = int(-(-self.row_lens[l, row] // self.P))
            if n:
                self._release_pages(l, self.page_tables[l, row, :n])
        self.row_lens[:, row] = 0
        self._free_rows.append(row)
        seq.row = -1

    # ----------------------------------------------------------------- pages

    def _stk(self, layer: int) -> int:
        return 0 if self.GP else layer

    def _pop_pages(self, layer: int, n: int) -> np.ndarray:
        layer = self._stk(layer)
        top = self._free_top[layer]
        if n > top and self.prefix_index is not None:
            # reclaim unreferenced prefix-cache blocks (1 page/layer each).
            self._evict_prefix_blocks(n - int(top))
            top = self._free_top[layer]
        if n > top:
            raise RuntimeError(
                f"KV pool exhausted: layer {layer} needs {n} pages, "
                f"{top} free (scheduler admission bug or missing preemption)"
            )
        self._free_top[layer] = top - n
        pages = self._free[layer, top - n : top][::-1].copy()
        self._page_refs[layer, pages] = 1
        return pages

    def _push_pages(self, layer: int, pages: np.ndarray) -> None:
        layer = self._stk(layer)
        top = self._free_top[layer]
        n = len(pages)
        self._free[layer, top : top + n] = pages[::-1]
        self._free_top[layer] = top + n

    def _release_pages(self, layer: int, pages: np.ndarray) -> None:
        """Decrement refcounts; pages hitting 0 return to the free stack."""
        pages = np.asarray(pages)
        layer = self._stk(layer)
        self._page_refs[layer, pages] -= 1
        refs = self._page_refs[layer, pages]
        if np.any(refs < 0):
            raise AssertionError(
                f"page refcount underflow at layer {layer}"
            )
        dead = pages[refs == 0]
        if len(dead):
            self._push_pages(layer, dead)

    def _evict_prefix_blocks(self, n_pages: int) -> None:
        """Evict LRU cache blocks until n_pages per layer were actually
        reclaimed (blocks whose pages a live sequence still holds release
        only the cache's reference)."""
        freed = 0
        self._invalidate_reclaim_cache()
        while freed < n_pages:
            blocks = self.prefix_index.evict(1)
            if not blocks:
                return
            b = blocks[0]
            reclaims = self._page_refs[0, b.pages[0]] == 1
            for l in range(self.L):
                self._release_pages(l, b.pages[l : l + 1])
            if reclaims:
                freed += 1

    def _queue_update(self, l_idx, r_idx, i_idx, pages) -> None:
        self._upd_l.append(np.asarray(l_idx, np.int32).ravel())
        self._upd_r.append(np.asarray(r_idx, np.int32).ravel())
        self._upd_i.append(np.asarray(i_idx, np.int32).ravel())
        self._upd_p.append(np.asarray(pages, np.int32).ravel())

    def drain_table_updates(self):
        """Returns (l, r, i, page) int32 arrays of pending device updates."""
        if not self._upd_l:
            return None
        out = (
            np.concatenate(self._upd_l),
            np.concatenate(self._upd_r),
            np.concatenate(self._upd_i),
            np.concatenate(self._upd_p),
        )
        self._upd_l, self._upd_r, self._upd_i, self._upd_p = [], [], [], []
        return out

    # ------------------------------------------------------------- prefill

    def alloc_prefill(self, seq: Sequence, chunk: int) -> np.ndarray:
        """Extend the row by `chunk` prompt tokens; returns layer-shared
        destination slots [chunk] (global slot = page*P + offset).

        Layers are in lockstep during prefill (see module docstring), so the
        layer-0 allocation is representative; an assertion guards the
        invariant.
        """
        row = self.seq_rows[seq.seq_id]
        start = int(self.row_lens[0, row])
        if not np.all(self.row_lens[:, row] == start):
            raise AssertionError(
                "prefill requires layer-lockstep rows; per-layer divergence "
                "must only happen after prefill"
            )
        end = start + chunk
        n_pages_total = -(-end // self.P)
        n_new = n_pages_total - (start + self.P - 1) // self.P
        if n_new > 0:
            base_pages = None
            for l in range(self.L):
                pages = self._pop_pages(l, n_new)
                if l == 0:
                    base_pages = pages
                idx = np.arange(n_pages_total - n_new, n_pages_total)
                self.page_tables[l, row, idx] = pages
                self._queue_update(
                    np.full(n_new, l), np.full(n_new, row), idx, pages
                )
        positions = np.arange(start, end, dtype=np.int64)
        pages_of = self.page_tables[0, row, positions // self.P].astype(np.int64)
        dest = pages_of * self.P + positions % self.P
        self.row_lens[:, row] = end
        return dest.astype(np.int32)

    # --------------------------------------------------------------- decode

    def alloc_decode(
        self, seqs: list[Sequence], k: int = 1
    ) -> tuple[np.ndarray, np.ndarray]:
        """Append ``k`` tokens per sequence (decode megastep).

        Returns (dest_slots [L, B, k] int32, ctx_start [L, B] int32) where
        ctx_start is the resident length BEFORE this megastep — the executor
        computes per-step context as ctx_start + t + 1 inside the scan.

        Hot path: the native C implementation (csrc/pagepool.cpp) handles
        the L x B x k loop when built; the Python loop below is the
        reference semantics and the fallback. Prefix-cache configurations
        stay on the Python path (it can evict cache blocks on demand).
        """
        if self.prefix_index is None and not self.GP:
            from . import native

            rows = np.asarray(
                [self.seq_rows[s.seq_id] for s in seqs], np.int32
            )
            out = native.alloc_decode(self, rows, k)
            if out is not None:
                dest, ctx_start, updates = out
                if updates is not None:
                    self._queue_update(*updates)
                return dest, ctx_start
        b = len(seqs)
        dest = np.zeros((self.L, b, k), np.int32)
        ctx_start = np.zeros((self.L, b), np.int32)
        for j, seq in enumerate(seqs):
            row = self.seq_rows[seq.seq_id]
            for l in range(self.L):
                pos0 = int(self.row_lens[l, row])
                ctx_start[l, j] = pos0
                # pages covering [pos0, pos0+k) not yet allocated
                have = -(-pos0 // self.P)  # pages currently held
                need_through = (pos0 + k - 1) // self.P
                n_new = need_through + 1 - have
                if n_new > 0:
                    pages = self._pop_pages(l, n_new)
                    idx = np.arange(have, need_through + 1)
                    self.page_tables[l, row, idx] = pages
                    self._queue_update(
                        np.full(n_new, l), np.full(n_new, row), idx, pages
                    )
                positions = pos0 + np.arange(k)
                dest[l, j] = (
                    self.page_tables[l, row, positions // self.P] * self.P
                    + positions % self.P
                )
                self.row_lens[l, row] = pos0 + k
        return dest, ctx_start

    def ctx_lens(self, seqs: list[Sequence]) -> np.ndarray:
        """Per-layer context lengths [L, B] (post-allocation)."""
        rows = [self.seq_rows[s.seq_id] for s in seqs]
        return self.row_lens[:, rows].astype(np.int32)

    def rows_of(self, seqs: list[Sequence]) -> np.ndarray:
        return np.asarray(
            [self.seq_rows[s.seq_id] for s in seqs], np.int32
        )

    # ------------------------------------------------- MemoryOracle protocol

    def num_free_pages(self) -> int:
        """Free pages per layer (min), counting prefix-cache blocks that an
        eviction would actually reclaim (refcount-0 blocks whose pages are
        held only by the cache) — otherwise a full cache would deadlock
        admission of new prompts."""
        free = int(self._free_top.min())
        if self.prefix_index is not None:
            free += self._reclaimable_blocks()
        return free

    def _reclaimable_blocks(self) -> int:
        """Cached count of evictable cache blocks. The scan is O(blocks) but
        runs only after a mutation (attach/commit/free/evict) — the
        scheduler queries num_free_pages many times per step (ADVICE r1)."""
        n = self._reclaim_cache
        if n is None:
            n = 0
            for node in self.prefix_index._nodes.values():
                if node.refcount == 0 and (
                    self._page_refs[0, node.pages[0]] == 1
                ):
                    n += 1
            self._reclaim_cache = n
        return n

    def _invalidate_reclaim_cache(self) -> None:
        self._reclaim_cache = None

    def num_free_rows(self) -> int:
        return len(self._free_rows)

    def admission_cost_pages(self, seq: Sequence) -> int:
        """Dense: the whole prompt plus one decode token must fit.

        Per-layer pools: cost is pages PER LAYER (every layer draws the
        same count from its own stack). Global pool: cost is TOTAL pages
        (all layers draw from one stack)."""
        per_layer = -(-(seq.num_prompt_tokens + 1) // self.P)
        return per_layer * self.L if self.GP else per_layer

    def can_admit(self, seq: Sequence) -> bool:
        return (
            self.num_free_rows() > 0
            and self.num_free_pages() >= self.admission_cost_pages(seq)
        )

    def prefill_step_cost_pages(self, seq: Sequence, chunk: int) -> int:
        start = seq.num_prefilled_tokens
        per_layer = (
            -(-(start + chunk) // self.P) - (start + self.P - 1) // self.P
        )
        return per_layer * self.L if self.GP else per_layer

    def decode_step_cost_pages(self, seq: Sequence, k: int = 1) -> int:
        """Worst-case new pages for a k-step decode: max over layers for
        per-layer pools, SUM over layers for the global pool."""
        row = self.seq_rows.get(seq.seq_id)
        if row is None:
            base = -(-k // self.P) + 1
            return base * self.L if self.GP else base
        lens = self.row_lens[:, row]
        have = -(-lens // self.P)
        need = (lens + k - 1) // self.P + 1
        d = need - have
        return int(d.sum()) if self.GP else int(d.max())

    def seq_resident_pages(self, seq: Sequence) -> int:
        row = self.seq_rows.get(seq.seq_id)
        if row is None:
            return 0
        per_layer = -(-self.row_lens[:, row] // self.P)
        return int(per_layer.sum()) if self.GP else int(np.max(per_layer))

    # ------------------------------------------------------- prefix cache

    def try_attach_prefix(self, seq: Sequence) -> int:
        """Map the longest cached prefix into the sequence's row across all
        layers (pure page-table edit — no KV bytes move, no recompute).
        Returns matched token count; the scheduler records it as already
        prefilled. At least one prompt token is always left to compute (the
        final logits must come from a real forward — reference
        usable_prefix_cache_tokens, prefix_cache.py:11-21)."""
        if self.prefix_index is None or seq.num_prefilled_tokens:
            return 0
        blocks = self.prefix_index.match_longest_prefix(seq.prompt_token_ids)
        max_blocks = (seq.num_prompt_tokens - 1) // self.P
        blocks = blocks[:max_blocks]
        if self.prefix_attach_filter is not None:
            # hybrid joint blocks: usable prefix must end on a block that
            # carries a recurrent-state snapshot (engine sets the filter)
            blocks = self.prefix_attach_filter(blocks)
        if not blocks:
            return 0
        self.prefix_index.acquire(blocks)
        self._invalidate_reclaim_cache()
        self._seq_prefix_blocks[seq.seq_id] = blocks
        row = self.seq_rows[seq.seq_id]
        n = len(blocks)
        pages = np.stack([b.pages for b in blocks], axis=1)  # [L, n]
        for l in range(self.L):
            self._page_refs[self._stk(l), pages[l]] += 1
            self.page_tables[l, row, :n] = pages[l]
            self._queue_update(
                np.full(n, l), np.full(n, row), np.arange(n), pages[l]
            )
        self.row_lens[:, row] = n * self.P
        if self.on_prefix_attached is not None:
            self.on_prefix_attached(seq, blocks)
        return n * self.P

    def commit_prefix(self, seq: Sequence) -> list:
        """After prefill completes, publish the prompt's full pages into the
        radix index (reference PrefixCacheMixin.on_forward_end commit).
        Returns the newly created blocks (hybrid engines attach recurrent
        state snapshots to them)."""
        if self.prefix_index is None:
            return []
        row = self.seq_rows.get(seq.seq_id)
        if row is None:
            return []
        upto = (seq.num_prompt_tokens // self.P) * self.P
        table = self.page_tables[:, row]  # [L, MP]

        def pages_of(i: int) -> np.ndarray:
            return table[:, i]

        created = self.prefix_index.insert_chain(
            seq.prompt_token_ids, pages_of, upto
        )
        self._invalidate_reclaim_cache()
        for node in created:
            for l in range(self.L):
                self._page_refs[self._stk(l), node.pages[l]] += 1
        return created

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

    # ----------------------------------------------------- sparse hook points

    def on_prefill_chunk_end(self, seqs: list[Sequence], final: bool) -> list:
        """Called after each prefill step; eviction methods return device-op
        requests (executor executes them). Base: no-op."""
        return []

    def on_decode_step_end(self, seqs: list[Sequence]) -> list:
        return []

    def free_slot_stats(self) -> dict:
        return {
            "free_pages_min": int(self._free_top.min()),
            "free_pages_max": int(self._free_top.max()),
            "free_rows": len(self._free_rows),
            "total_pages": self.num_pages - 1,
        }
