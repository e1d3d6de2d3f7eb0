"""Probe: AOT memory analysis of the prefill-step program.

Diagnoses the 128K int4 E2E compile OOM (two padded s8 cache copies as
HLO temps around the prefill layer scan). Intercepts the first prefill
dispatch, AOT-lowers it with the real argument set, and prints the
compiled program's memory breakdown (argument/output/temp/alias bytes)
so layouts can be compared across kv dtypes without a 16 GiB repro.

Usage: python scripts/probe_prefill_mem.py --ctx 16384 --kv-dtype int4
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=16384)
    ap.add_argument("--kv-dtype", default="int4")
    ap.add_argument("--method", default="snapkv")
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--impl", default="auto")
    args = ap.parse_args()

    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax

    import bench
    from sparsevllm_tpu.engine import executor as ex_mod

    orig = ex_mod.ModelExecutor._get_prefill_fn

    state = {"done": False}

    def patched(self, bb, sb, mp, mode, nlp=-1, emit_obs=True):
        fn = orig(self, bb, sb, mp, mode, nlp, emit_obs)
        if state["done"] or sb < args.chunk:
            return fn

        def wrapper(*a):
            if not state["done"]:
                state["done"] = True
                lowered = fn.lower(*a)
                comp = lowered.compile()
                ma = comp.memory_analysis()
                print(f"=== prefill bucket B={bb} S={sb} MP={mp} "
                      f"kv={args.kv_dtype} ===", file=sys.stderr)
                print(ma, file=sys.stderr)
                ga = getattr(ma, "generated_code_size_in_bytes", None)
                for k in ("argument_size_in_bytes", "output_size_in_bytes",
                          "temp_size_in_bytes", "alias_size_in_bytes",
                          "generated_code_size_in_bytes"):
                    v = getattr(ma, k, None)
                    if v is not None:
                        print(f"  {k}: {v / 2**30:.2f} GiB", file=sys.stderr)
                _ = ga
                raise SystemExit(0)
            return fn(*a)

        return wrapper

    ex_mod.ModelExecutor._get_prefill_fn = patched
    try:
        bench.run_e2e(batch=1, steps=8, ctx=args.ctx, keep=4608,
                      impl=args.impl, kv_dtype=args.kv_dtype,
                      method=args.method, chunk=args.chunk)
    except SystemExit:
        pass
    _ = np
    _ = jax


if __name__ == "__main__":
    main()
