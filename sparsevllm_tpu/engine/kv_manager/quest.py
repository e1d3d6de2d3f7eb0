"""Quest manager: dense paged storage + query-aware page selection.

Reference counterpart: engine/cache_manager/quest.py (page pool with
min/max metadata summaries :86-97, decode-time q·(min,max) upper-bound page
top-k :1270+, dense prefill, first `quest_skip_layers` layers dense).

In the TPU build Quest's pages ARE the cache pages (metadata granularity =
``quest_page_size`` sub-pages of each KV page). Storage/bookkeeping is
identical to the standard manager; the min/max metadata lives on device in
the executor (updated in-jit at KV-store time) and selection happens inside
the decode scan — so this host class only sizes the metadata pool.
"""

from __future__ import annotations

from .base import KVCacheManager


class QuestKVManager(KVCacheManager):
    def __init__(self, config, num_kv_layers, num_pages, max_rows):
        super().__init__(config, num_kv_layers, num_pages, max_rows)
        self.quest_page_size = config.quest_page_size
        self.sub_pages_per_page = self.P // self.quest_page_size
