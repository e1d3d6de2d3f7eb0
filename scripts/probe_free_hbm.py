"""Measure ACTUAL free HBM after 7B engine construction (the axon backend
reports no memory_stats): binary-search the largest jnp.zeros allocation
that succeeds. If free << 16 GiB - static ledger, something is pinned."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe_free() -> float:
    import jax
    import jax.numpy as jnp

    lo, hi = 0, 16 << 30
    ok = 0
    while hi - lo > (64 << 20):
        mid = (lo + hi) // 2
        try:
            x = jnp.zeros((mid // 4,), jnp.float32)
            x.block_until_ready()
            del x
            ok = mid
            lo = mid
        except Exception:  # noqa: BLE001
            hi = mid
    return ok / 2**30


def main() -> None:
    import bench

    print(f"free BEFORE engine: {probe_free():.2f} GiB", flush=True)
    engine, spec, name, mode, k_disp, _ = bench.build_engine(
        1, 8, 131072, 4608, "auto", kv_dtype="int4",
        method="deltakv", staging="none",
        model_class="7b", weight_quant="fp8")
    print(f"engine up: {name}", flush=True)
    print(f"free AFTER engine: {probe_free():.2f} GiB", flush=True)
    engine.exit()


if __name__ == "__main__":
    main()
