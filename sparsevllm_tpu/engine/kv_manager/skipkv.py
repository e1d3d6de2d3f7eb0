"""SkipKV manager: sentence-granular eviction of GENERATED tokens.

Reference counterpart: engine/cache_manager/skipkv.py (RKV subclass; sentence
segmentation of generated tokens via delimiter ids :49-126, sentence scoring
with redundancy penalties :190-351, periodic eviction of low-value sentences
:476-628) paired with activation steering
(engine/activation_controller.py:55-232 — here an optional per-layer steering
vector applied in the decode scan, models/transformer.py rt.steer).

TPU flow: segmentation is pure host bookkeeping over completion token ids;
at eviction time whole low-value sentences are masked out of the retention
scores (sentence mask shipped with the plan), and the same jitted
score+compact op runs — sentence eviction is compaction with a coarser mask.
"""

from __future__ import annotations

import numpy as np

from .rkv import RKVManager
from ..sequence import Sequence


class SkipKVManager(RKVManager):
    def __init__(self, config, num_kv_layers, num_pages, max_rows):
        super().__init__(config, num_kv_layers, num_pages, max_rows)
        self.delimiters = set(config.skipkv_delimiter_tokens)

    def sentence_spans(self, seq: Sequence) -> list[tuple[int, int]]:
        """Generated-token sentence spans [(start, end) absolute positions),
        split after delimiter tokens (reference _finalize_sentence :163)."""
        base = seq.num_prompt_tokens
        spans = []
        start = base
        for i, tok in enumerate(seq.completion_token_ids):
            if tok in self.delimiters:
                spans.append((start, base + i + 1))
                start = base + i + 1
        # the trailing unfinished sentence is never evicted
        return spans

    def plan_decode_eviction(self, seqs: list[Sequence]) -> dict | None:
        plan = super().plan_decode_eviction(seqs)
        if plan is None:
            return None
        # sentence structure rides the plan: token positions inside a
        # completed generated sentence are eviction candidates as a UNIT —
        # the executor averages retention over each sentence and masks out
        # whole low-value sentences before the top-k (reference :476-628).
        due = plan["seqs"]
        max_ctx = int(plan["ctx"].max())
        sent_id = np.full((len(due), max_ctx), -1, np.int32)
        for j, s in enumerate(due):
            for si, (a, b) in enumerate(self.sentence_spans(s)):
                sent_id[j, a:b] = si
        plan["sentence_id"] = sent_id
        return plan
