"""ctypes bindings for the native page-pool hot loops (csrc/pagepool.cpp).

Builds the shared object on first import (g++, cached next to the source);
every entry point degrades to the Python implementation when the toolchain
or the build is unavailable, so the native path is a pure accelerator —
identical bookkeeping, asserted by tests/test_native_pagepool.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ...utils.log import logger

_LIB = None
_TRIED = False


def _csrc_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        ))),
        "csrc",
    )


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("SPARSEVLLM_TPU_DISABLE_NATIVE"):
        return None
    d = _csrc_dir()
    so = os.path.join(d, "libpagepool.so")
    src = os.path.join(d, "pagepool.cpp")
    try:
        if not os.path.exists(so) or (
            os.path.getmtime(so) < os.path.getmtime(src)
        ):
            subprocess.check_call(
                ["make", "-C", d, "-s"],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
        lib = ctypes.CDLL(so)
    except Exception as e:  # noqa: BLE001 — python fallback
        logger.info("native pagepool unavailable (%r); using Python path", e)
        return None

    i64 = ctypes.c_int64
    p32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    p64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.pagepool_alloc_decode.restype = ctypes.c_int
    lib.pagepool_alloc_decode.argtypes = [
        i64, i64, i64, i64, i64, i64, i64,   # L B k P MP cap num_pages
        p32, p64, p32,                        # free_stacks free_tops refs
        p32, p64, i64,                        # page_tables row_lens rows
        p32,                                  # row_ids
        p32, p32,                             # dest ctx_start
        p32, p32, p32, p32, p64,              # upd_l/r/i/p n_upd
    ]
    lib.pagepool_decode_cost.restype = i64
    lib.pagepool_decode_cost.argtypes = [i64, i64, i64, i64, p64, i64, p32]
    _LIB = lib
    logger.info("native pagepool loaded (%s)", so)
    return _LIB


def alloc_decode(mgr, row_ids: np.ndarray, k: int):
    """Native alloc_decode over the manager's buffers. Returns
    (dest [L,B,k], ctx_start [L,B], updates tuple) or None on fallback."""
    lib = get_lib()
    if lib is None:
        return None
    L, B = mgr.L, len(row_ids)
    dest = np.zeros((L, B, k), np.int32)
    ctx = np.zeros((L, B), np.int32)
    max_upd = L * B * (k // mgr.P + 2)
    upd_l = np.zeros(max_upd, np.int32)
    upd_r = np.zeros(max_upd, np.int32)
    upd_i = np.zeros(max_upd, np.int32)
    upd_p = np.zeros(max_upd, np.int32)
    n_upd = np.zeros(1, np.int64)
    rc = lib.pagepool_alloc_decode(
        L, B, k, mgr.P, mgr.MP, mgr._free.shape[1], mgr.num_pages,
        mgr._free, mgr._free_top, mgr._page_refs,
        mgr.page_tables, mgr.row_lens, mgr.max_rows,
        np.ascontiguousarray(row_ids, np.int32),
        dest, ctx, upd_l, upd_r, upd_i, upd_p, n_upd,
    )
    if rc != 0:
        raise RuntimeError(
            "KV pool exhausted during decode allocation (native path; "
            "scheduler admission bug or missing preemption)"
        )
    n = int(n_upd[0])
    updates = (
        (upd_l[:n].copy(), upd_r[:n].copy(), upd_i[:n].copy(),
         upd_p[:n].copy())
        if n else None
    )
    return dest, ctx, updates
