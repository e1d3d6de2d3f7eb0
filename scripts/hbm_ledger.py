"""Per-buffer HBM ledger for a bench.py lane (VERDICT r4 next #1).

The axon TPU backend reports no ``memory_stats``, so runtime residency
cannot be probed — instead this script accounts HBM *analytically*:

1. STATIC ledger: every live device array the engine/executor holds
   (params by group, KV pools, scales, deltakv state, tables, rope),
   in real (tile-padded where relevant) bytes.
2. PROGRAM ledger: AOT ``jit(...).lower(avals).compile()`` of the exact
   step functions the lane dispatches (first + largest prefill bucket,
   deltakv compress, decode megastep) and print
   ``Compiled.memory_analysis()`` — XLA's own buffer-assignment totals
   (argument/output/temp/generated-code bytes). temp_size is the number
   that explains a ResourceExhausted that static accounting misses.

Usage (the 7B north-star lane that OOMs, PERF_NOTES r4):
  python scripts/hbm_ledger.py --model-class 7b --weight-quant fp8 \
      --method deltakv --kv-dtype int4 [--ctx 131072] [--aot-only]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _gib(n: int) -> str:
    return f"{n / 2**30:.3f} GiB"


def _tree_bytes(tree) -> int:
    import jax

    return sum(
        x.nbytes for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "nbytes")
    )


def static_ledger(engine) -> int:
    ex = engine.executor
    rows = []

    def add(name, obj):
        b = _tree_bytes(obj)
        if b:
            rows.append((name, b))
        return b

    params = ex.params
    if isinstance(params, dict):
        for k, v in params.items():
            add(f"params.{k}", v)
    else:
        add("params", params)
    for name in ("k_cache", "v_cache", "kv_scales", "quest_meta",
                 "tables", "rope", "dk_state", "dk_comp", "query_cache",
                 "steer_vec", "conv_state", "rec_state"):
        add(name, getattr(ex, name, None))
    total = sum(b for _, b in rows)
    print("== static device arrays ==")
    for name, b in sorted(rows, key=lambda r: -r[1]):
        print(f"  {name:28s} {_gib(b):>12s}")
    print(f"  {'TOTAL static':28s} {_gib(total):>12s}")
    return total


def _avals(tree):
    import jax

    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype)
        if hasattr(x, "dtype") else x,
        tree,
    )


def _prefill_plan_avals(ex, bb, sb, quest):
    plan = {
        "token_ids": np.zeros((bb, sb), np.int32),
        "positions": np.zeros((bb, sb), np.int32),
        "slot_positions": np.zeros((bb, sb), np.int32),
        "dest_slot": np.zeros((bb, sb), np.int32),
        "row_ids": np.zeros((bb,), np.int32),
        "ctx_lens": np.zeros(bb, np.int32),
        "new_lens": np.zeros(bb, np.int32),
        "step": np.asarray(0, np.int32),
        "temps": np.zeros(bb, np.float32),
        "top_k": np.zeros(bb, np.int32),
        "top_p": np.ones(bb, np.float32),
    }
    if quest:
        p = ex.config.page_size
        plan["touched_pages"] = np.zeros((bb, sb // p + 1), np.int32)
    return _avals(ex._put_plan(plan, "prefill"))


def aot_report(label: str, fn, args) -> None:
    import jax

    try:
        lowered = fn.lower(*args)
        compiled = lowered.compile()
        if os.environ.get("LEDGER_DUMP_BUFFERS"):
            # largest buffer-assignment entries straight from the
            # compiled executable text (finds individual temp monsters
            # the aggregate numbers hide)
            try:
                txt = compiled.as_text()
                import re

                sizes = re.findall(
                    r"allocation \d+: size (\d+)", txt) or re.findall(
                    r"size=(\d+)", txt)
                top = sorted((int(s) for s in sizes), reverse=True)[:12]
                print(f"  top allocations: "
                      f"{[f'{t/2**20:.0f}MiB' for t in top]}")
            except Exception as e:  # noqa: BLE001
                print(f"  buffer dump unavailable: {type(e).__name__}")
        ma = compiled.memory_analysis()
        if ma is None:
            print(f"== {label}: memory_analysis unavailable ==")
            return
        print(f"== {label} ==")
        print(f"  arguments  {_gib(ma.argument_size_in_bytes):>12s}")
        print(f"  outputs    {_gib(ma.output_size_in_bytes):>12s}")
        print(f"  aliased    {_gib(ma.alias_size_in_bytes):>12s}  "
              f"(donated; not double-counted)")
        print(f"  TEMPS      {_gib(ma.temp_size_in_bytes):>12s}  "
              f"<- program scratch on top of the static ledger")
        print(f"  code       {_gib(ma.generated_code_size_in_bytes):>12s}")
        live = (ma.argument_size_in_bytes - ma.alias_size_in_bytes
                + ma.output_size_in_bytes + ma.temp_size_in_bytes)
        print(f"  peak est.  {_gib(live):>12s}  (args-alias+out+temps)")
    except Exception as e:  # noqa: BLE001
        print(f"== {label}: AOT failed: {type(e).__name__}: {e} ==")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--ctx", type=int, default=131072)
    ap.add_argument("--keep", type=int, default=4608)
    ap.add_argument("--impl", default="auto")
    ap.add_argument("--page", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--method", default="deltakv")
    ap.add_argument("--kv-dtype", default="int4")
    ap.add_argument("--model-class", default="7b")
    ap.add_argument("--weight-quant", default="fp8")
    ap.add_argument("--staging", default="none")
    ap.add_argument("--skip-largest", action="store_true")
    ap.add_argument("--decode", action="store_true",
                    help="AOT the decode megastep and hunt relayout copies")
    ap.add_argument("--skip-prefill", action="store_true")
    args = ap.parse_args()

    import bench

    engine, spec, name, mode, k_disp, _ = bench.build_engine(
        args.batch, args.steps, args.ctx, args.keep, args.impl,
        kv_dtype=args.kv_dtype, page=args.page, method=args.method,
        chunk=args.chunk, staging=args.staging,
        model_class=args.model_class, weight_quant=args.weight_quant)
    ex = engine.executor
    print(f"model={name} method={args.method} kv={args.kv_dtype} "
          f"weights={args.weight_quant} mode={mode}")
    static = static_ledger(engine)

    quest = bool(ex._rt.quest)
    core = (_avals(ex.params), _avals(ex.k_cache), _avals(ex.v_cache),
            _avals(ex.quest_meta), _avals(ex.kv_scales),
            _avals(ex.tables))
    rope = _avals(ex.rope)

    # first prefill bucket (where the 7B lane died)
    if not args.skip_prefill:
        bb, sb, mp = ex._prefill_buckets(args.batch, args.chunk, args.chunk)
        plan = _prefill_plan_avals(ex, bb, sb, quest)
        fn = ex._get_prefill_fn(bb, sb, mp, "greedy", -1, False)
        aot_report(f"prefill bucket bb={bb} sb={sb} mp={mp} (first chunk)",
                   fn, (*core[:1], *core[1:6], plan, rope))

    if not args.skip_largest and not args.skip_prefill:
        bb2, sb2, mp2 = ex._prefill_buckets(
            args.batch, args.chunk, args.ctx)
        if (bb2, sb2, mp2) != (bb, sb, mp):
            plan2 = _prefill_plan_avals(ex, bb2, sb2, quest)
            fn2 = ex._get_prefill_fn(bb2, sb2, mp2, "greedy", -1, True)
            aot_report(
                f"prefill bucket bb={bb2} sb={sb2} mp={mp2} (deepest, "
                f"emit_obs)", fn2, (*core[:1], *core[1:6], plan2, rope))

    if args.decode:
        # AOT the decode megastep and locate whole-table relayout copies
        # (the 2.84 GiB latents copy that broke the recon-v2.1 compile)
        ex._rt = ex._rt  # noqa: B018
        bb2, mp2 = ex._decode_buckets(args.batch, -(-args.ctx // args.page))
        k = engine.config.decode_steps_per_dispatch
        mpr = mp2
        if ex._rt.deltakv:
            mpr = min(engine.config.context_bucket_pages(8), mp2)
        fn = ex._get_decode_fn(bb2, mp2, k, "greedy", mpr, -1)
        dplan = {
            "token_ids0": np.zeros(bb2, np.int32),
            "positions0": np.zeros(bb2, np.int32),
            "row_ids": np.zeros(bb2, np.int32),
            "dest": np.zeros((spec.num_layers, bb2, k), np.int32),
            "ctx_start": np.zeros((spec.num_layers, bb2), np.int32),
            "step": np.asarray(0, np.int32),
            "temps": np.zeros(bb2, np.float32),
            "top_k": np.zeros(bb2, np.int32),
            "top_p": np.ones(bb2, np.float32),
        }
        if ex._rt.deltakv:
            dplan["comp_counts"] = np.zeros(bb2, np.int32)
        dplan = _avals(ex._put_plan(dplan, "decode"))
        try:
            lowered = fn.lower(
                _avals(ex.params), _avals(ex.k_cache), _avals(ex.v_cache),
                _avals(ex.quest_meta), _avals(ex.kv_scales),
                _avals(ex.query_cache), _avals(ex.dk_state),
                _avals(ex.dk_comp), _avals(ex.dk_recon),
                _avals(ex.tables), dplan, _avals(ex.rope))
            compiled = lowered.compile()
            ma = compiled.memory_analysis()
            print(f"== decode megastep bb={bb2} mp={mp2} k={k}: temps "
                  f"{_gib(ma.temp_size_in_bytes)} ==")
            try:
                ca = compiled.cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                ba = ca.get("bytes accessed", 0.0)
                print(f"  cost: {ca.get('flops', 0.0)/1e9:.1f} GFLOP, "
                      f"{ba/2**30:.2f} GiB accessed "
                      f"(/step: {ba/k/2**20:.1f} MiB, "
                      f"BW floor {ba/k/747e9*1e3:.2f} ms @747GB/s)")
                for key, v in sorted(ca.items(), key=lambda kv: -kv[1]):
                    if key.startswith("bytes accessed") and v > 50 * 2**20 \
                            and key != "bytes accessed":
                        print(f"    {key:28s} {v/2**20:8.1f} MiB")
            except Exception as e:  # noqa: BLE001
                print(f"  cost_analysis unavailable: {type(e).__name__}")
            txt = compiled.as_text()
            dump = os.environ.get("LEDGER_HLO_OUT")
            if dump:
                with open(dump, "w") as f:
                    f.write(txt)
                print(f"  HLO dumped to {dump} ({len(txt)/2**20:.1f} MiB)")
            import re

            for m in re.finditer(
                r"^\s*%?(copy[.\w]*) = (\S*f32\[26[^\]]*\][^ ]*) "
                r"copy\(([^)]*)\)(.*)$", txt, re.M,
            ):
                print("  RELAYOUT:", m.group(1), m.group(2),
                      m.group(4)[:300])
        except Exception as e:  # noqa: BLE001
            print(f"decode AOT failed: {type(e).__name__}: "
                  f"{str(e)[:2000]}")

    print(f"\nstatic total: {_gib(static)}; add the TEMPS line of the "
          f"active bucket for the true HBM requirement.")
    engine.exit()


if __name__ == "__main__":
    main()
