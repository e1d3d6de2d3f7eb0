"""Bounds + slot-leak checkers (engine/debug_checks.py).

Reference counterparts: SVLLM_DEBUG_*_BOUNDS attention checkers
(attention_backend.py:115-173,334-374) and SPARSEVLLM_DEBUG_SLOTS zombie-seq
diagnostics (scheduler.py:440-473). The negative cases pin that corruption
actually raises — a checker that never fires is worse than none.
"""

import numpy as np
import pytest

from sparsevllm_tpu.config import Config
from sparsevllm_tpu.engine import debug_checks as dc
from sparsevllm_tpu.engine.kv_manager.base import KVCacheManager
from sparsevllm_tpu.engine.sequence import Sequence
from sparsevllm_tpu.sampling_params import SamplingParams


def _mgr(**kw):
    cfg = Config(
        method="", page_size=16, num_kv_pages=64, max_model_len=512,
        chunk_prefill_size=64, max_num_batched_tokens=256,
        max_decoding_seqs=4, max_num_seqs_in_batch=4, **kw,
    )
    return KVCacheManager.create(cfg, 2, 64, 4)


def _seq(n=40):
    return Sequence([1] * n, SamplingParams(max_tokens=8))


def test_prefill_plan_clean_passes():
    kv = _mgr()
    s = _seq()
    kv.alloc_row(s)
    dest = kv.alloc_prefill(s, 40)
    dc.check_prefill_plan(kv, [s], [dest], kv.rows_of([s]))


def test_prefill_plan_out_of_range_raises():
    kv = _mgr()
    s = _seq()
    kv.alloc_row(s)
    dest = kv.alloc_prefill(s, 40).copy()
    dest[3] = 64 * 16 + 5  # past the pool
    with pytest.raises(dc.BoundsError, match="out of range"):
        dc.check_prefill_plan(kv, [s], [dest], kv.rows_of([s]))


def test_prefill_plan_unowned_page_raises():
    kv = _mgr()
    s = _seq()
    kv.alloc_row(s)
    dest = kv.alloc_prefill(s, 40).copy()
    free_page = kv._free[0, 0]  # a page the row does not own
    dest[:16] = free_page * 16 + np.arange(16)
    with pytest.raises(dc.BoundsError, match="not mapped"):
        dc.check_prefill_plan(kv, [s], [dest], kv.rows_of([s]))


def test_decode_plan_clean_and_corrupted():
    kv = _mgr()
    s = _seq(16)
    kv.alloc_row(s)
    kv.alloc_prefill(s, 16)
    s.num_prefilled_tokens = 16
    dest, ctx = kv.alloc_decode([s], 4)
    dc.check_decode_plan(kv, [s], dest, ctx)
    bad = dest.copy()
    bad[0, 0, 1] = bad[0, 0, 0]  # repeat within megastep
    with pytest.raises(dc.BoundsError, match="repeat"):
        dc.check_decode_plan(kv, [s], bad, ctx)
    bad2 = np.asarray(ctx).copy()
    bad2[0, 0] += 1
    with pytest.raises(dc.BoundsError, match="disagrees"):
        dc.check_decode_plan(kv, [s], dest, bad2)


def test_page_accounting_detects_leak_and_zombie():
    kv = _mgr()
    s = _seq()
    kv.alloc_row(s)
    kv.alloc_prefill(s, 40)
    dc.check_page_accounting(kv, [s.seq_id])
    # zombie: seq not in the live set
    with pytest.raises(dc.SlotLeakError, match="zombie"):
        dc.check_page_accounting(kv, [])
    # leak: drop a page from the free stack without assigning it
    kv._free_top[0] -= 1
    with pytest.raises(dc.SlotLeakError, match="leaked"):
        dc.check_page_accounting(kv, [s.seq_id])
