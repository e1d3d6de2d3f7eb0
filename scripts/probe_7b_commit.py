"""Quantify the 7B phantom residency: eagerly COMMIT every static array
of the 7B engine (tiny jitted reads force lazy-zeros materialization),
then attempt ONE committed allocation of --try-gib. A failure right
after a ~10 GiB static commit on a 15 GiB chip means commitment is
inflated (padding/rounding/fragmentation) — the size that still works
bounds the phantom. One attempt per process (failed allocations poison
the allocator; PERF_NOTES r5)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--try-gib", type=float, default=3.0)
    ap.add_argument("--model-class", default="7b")
    ap.add_argument("--weight-quant", default="fp8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench

    engine, spec, name, mode, *_ = bench.build_engine(
        1, 8, 131072, 4608, "auto", kv_dtype="int4", method="vanilla",
        staging="none", model_class=args.model_class,
        weight_quant=args.weight_quant)
    ex = engine.executor
    print(f"engine up: {name}", flush=True)

    committed = 0
    for name_, obj in [("params", ex.params), ("k", ex.k_cache),
                       ("v", ex.v_cache), ("scales", ex.kv_scales),
                       ("tables", ex.tables), ("rope", ex.rope)]:
        for leaf in jax.tree_util.tree_leaves(obj):
            if not hasattr(leaf, "nbytes"):
                continue
            # dependent host fetch: forces a REAL commit of the buffer
            s = jax.jit(lambda x: jnp.sum(x[..., :1].astype(jnp.float32)))(
                leaf)
            float(s)
            committed += leaf.nbytes
    print(f"eager-committed static: {committed/2**30:.2f} GiB", flush=True)

    n = int(args.try_gib * 2**30) // 4
    try:
        x = jax.jit(lambda: jax.lax.iota(jnp.float32, n) * 3.0 + 1.0)()
        print(f"alloc {args.try_gib} GiB: OK (sample {float(x[-1]):.0f})",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"alloc {args.try_gib} GiB: FAILED ({type(e).__name__})",
              flush=True)
    engine.exit()


if __name__ == "__main__":
    main()
