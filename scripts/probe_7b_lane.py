"""Stepwise probe of the 7B deltakv north-star lane OOM (VERDICT r4 #1).

Builds the exact bench engine, then drives ONE request whose prompt grows
across runs, stepping the engine manually and printing after every
engine.step() — so the first ResourceExhausted names the exact dispatch
(prefill bucket / compress / decode) instead of dying inside bench.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--model-class", default="7b")
    ap.add_argument("--weight-quant", default="fp8")
    ap.add_argument("--method", default="deltakv")
    ap.add_argument("--kv-dtype", default="int4")
    ap.add_argument("--chunk", type=int, default=8192)
    args = ap.parse_args()

    import jax

    import bench
    from sparsevllm_tpu.sampling_params import SamplingParams

    engine, spec, name, mode, k_disp, _ = bench.build_engine(
        1, args.steps, 131072, 4608, "auto", kv_dtype=args.kv_dtype,
        method=args.method, staging="none", chunk=args.chunk,
        model_class=args.model_class, weight_quant=args.weight_quant)
    print(f"engine up: {name} mode={mode}", flush=True)

    rng = np.random.default_rng(0)
    ids = rng.integers(10, spec.vocab_size, size=args.ctx - 1).tolist()
    engine.add_request(prompt_token_ids=ids, sampling_params=SamplingParams(
        temperature=0.0, ignore_eos=True, max_tokens=args.steps + 64))

    n = 0
    t0 = time.perf_counter()
    while any(not s.prefill_done for s in engine.scheduler.running) \
            or engine.scheduler.waiting:
        out = engine.step()
        n += 1
        jax.block_until_ready(engine.executor.k_cache)
        print(f"prefill step {n} ok ({time.perf_counter()-t0:.1f}s)",
              flush=True)
        if not out:
            raise RuntimeError("stall")
    print("prefill complete; decoding...", flush=True)
    got = 0
    while got < args.steps:
        out = engine.step()
        got += sum(len(t) for _, t in out)
        jax.block_until_ready(engine.executor.k_cache)
        print(f"decode dispatch ok (+{got})", flush=True)
    print("PROBE OK", flush=True)
    engine.exit()


if __name__ == "__main__":
    main()
