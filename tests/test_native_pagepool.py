"""Native (C++) page-pool path vs the Python reference bookkeeping.

The native alloc_decode must leave IDENTICAL manager state (tables, lens,
free stacks, refcounts) and produce identical plans; offload tier roundtrip.
"""

import copy

import numpy as np
import pytest

from sparsevllm_tpu.config import Config
from sparsevllm_tpu.engine.kv_manager.base import KVCacheManager
from sparsevllm_tpu.engine.kv_manager import native
from sparsevllm_tpu.engine.sequence import Sequence
from sparsevllm_tpu.sampling_params import SamplingParams

CFG = dict(
    tiny_random=True, page_size=8, num_kv_pages=128, max_model_len=256,
    chunk_prefill_size=32, max_num_batched_tokens=128, max_decoding_seqs=4,
    num_sink_tokens=8, num_recent_tokens=16,
)


def _mgr_with_seqs(n_seqs=3, prefill=20):
    cfg = Config(**CFG)
    mgr = KVCacheManager.create(cfg, 3, 128, 8)
    seqs = []
    for i in range(n_seqs):
        s = Sequence([1] * 50, SamplingParams())
        mgr.alloc_row(s)
        mgr.alloc_prefill(s, prefill + i * 3)  # ragged page offsets
        s.num_prefilled_tokens = prefill + i * 3
        s.completion_token_ids.append(1)
        seqs.append(s)
    mgr.drain_table_updates()
    return mgr, seqs


def test_native_builds():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    assert lib is not None


def test_native_matches_python_alloc_decode():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    mgr_n, seqs_n = _mgr_with_seqs()
    mgr_p, seqs_p = _mgr_with_seqs()

    for k in (1, 4, 16):
        rows = np.asarray(
            [mgr_n.seq_rows[s.seq_id] for s in seqs_n], np.int32
        )
        out = native.alloc_decode(mgr_n, rows, k)
        assert out is not None
        dest_n, ctx_n, upd_n = out

        # python reference path (force fallback via a fake prefix index
        # sentinel being absent: call the loop directly)
        b = len(seqs_p)
        dest_p = np.zeros((mgr_p.L, b, k), np.int32)
        ctx_p = np.zeros((mgr_p.L, b), np.int32)
        for j, seq in enumerate(seqs_p):
            row = mgr_p.seq_rows[seq.seq_id]
            for l in range(mgr_p.L):
                pos0 = int(mgr_p.row_lens[l, row])
                ctx_p[l, j] = pos0
                have = -(-pos0 // mgr_p.P)
                need_through = (pos0 + k - 1) // mgr_p.P
                n_new = need_through + 1 - have
                if n_new > 0:
                    pages = mgr_p._pop_pages(l, n_new)
                    idx = np.arange(have, need_through + 1)
                    mgr_p.page_tables[l, row, idx] = pages
                positions = pos0 + np.arange(k)
                dest_p[l, j] = (
                    mgr_p.page_tables[l, row, positions // mgr_p.P]
                    * mgr_p.P + positions % mgr_p.P
                )
                mgr_p.row_lens[l, row] = pos0 + k

        np.testing.assert_array_equal(dest_n, dest_p)
        np.testing.assert_array_equal(ctx_n, ctx_p)
        np.testing.assert_array_equal(mgr_n.page_tables, mgr_p.page_tables)
        np.testing.assert_array_equal(mgr_n.row_lens, mgr_p.row_lens)
        np.testing.assert_array_equal(mgr_n._free_top, mgr_p._free_top)
        np.testing.assert_array_equal(mgr_n._page_refs, mgr_p._page_refs)


def test_native_pool_exhaustion_raises():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    cfg = Config(**{**CFG, "num_kv_pages": 4})
    mgr = KVCacheManager.create(cfg, 2, 4, 2)
    s = Sequence([1] * 20, SamplingParams())
    mgr.alloc_row(s)
    mgr.alloc_prefill(s, 20)
    rows = np.asarray([mgr.seq_rows[s.seq_id]], np.int32)
    with pytest.raises(RuntimeError, match="exhausted"):
        native.alloc_decode(mgr, rows, 16)
