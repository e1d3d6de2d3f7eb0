"""Headline benchmark: REAL end-to-end 128K-context SnapKV serving.

Mirrors the reference's headline metric (BASELINE.md: decode throughput at
128K context, Sparse-vLLM SnapKV = 338.8 tok/s on one CUDA GPU, from
scripts/analysis/plot_throughput_chart.py:16) — but measured HONESTLY:
every sequence's 128K prompt is chunk-prefilled through the production
engine (scheduler admission, paged KV, SnapKV observation scores,
prefill-end compaction), then decode throughput is measured over the
compacted state. Nothing is fabricated; admission, prefill, scoring,
compaction, and decode all execute on the chip.

Residency math that makes this possible on a 16 GiB chip: a 128K bf16
KV residency for a 3B-class model is ~14 GiB (> the ~8.5 GiB KV budget
after weights), so the default run stores KV quantized (KIVI-style int4,
fused dequant in the prefill/decode kernels) — ~4.6 GiB for the one
in-flight prompt. Long prompts prefill one at a time (the reference's
long_bs1full posture, scheduler.py:171-221) and leave only the compacted
`keep` tokens resident, so batch decode state is tiny.

Prints ONE JSON line:
  {"metric", "value", "unit", "vs_baseline", "prefill_tok_s", "e2e": true,
   "config": {...}}

The model is synthetic (random-init weights; no checkpoints ship in this
environment) and sized to the visible chip's HBM: 7B-class when >= 24 GiB,
3B-class when >= 12 GiB, 1B-class otherwise. Throughput depends on weights
+ KV streaming, not weight values, so random weights give the same tok/s
as trained ones.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np



BASELINE_TOK_S = 338.8  # reference SnapKV @128K (plot_throughput_chart.py:16)


def _pick_spec(hbm_gib: float):
    from sparsevllm_tpu.models.spec import ModelSpec

    if hbm_gib >= 24:
        name, kw = "qwen2.5-7b-class", dict(
            num_layers=28, hidden_size=3584, num_q_heads=28, num_kv_heads=4,
            head_dim=128, intermediate_size=18944, vocab_size=152064,
            tie_word_embeddings=False,
        )
    elif hbm_gib >= 12:
        name, kw = "llama-3.2-3b-class", dict(
            num_layers=28, hidden_size=3072, num_q_heads=24, num_kv_heads=8,
            head_dim=128, intermediate_size=8192, vocab_size=128256,
            tie_word_embeddings=True,
        )
    else:
        name, kw = "llama-1b-class", dict(
            num_layers=16, hidden_size=2048, num_q_heads=32, num_kv_heads=8,
            head_dim=64, intermediate_size=8192, vocab_size=128256,
            tie_word_embeddings=True,
        )
    return name, ModelSpec(
        model_type="llama", rms_norm_eps=1e-5, rope_theta=500000.0,
        max_position_embeddings=131072, **kw,
    )


def _smoke_spec():
    from sparsevllm_tpu.models.spec import ModelSpec

    return "tiny-smoke", ModelSpec(
        model_type="llama", num_layers=2, hidden_size=128, num_q_heads=8,
        num_kv_heads=4, head_dim=16, intermediate_size=256, vocab_size=512,
        rms_norm_eps=1e-5, rope_theta=500000.0,
        max_position_embeddings=131072, tie_word_embeddings=True,
    )


def _hbm_gib() -> float:
    import jax

    dev = jax.devices()[0]
    try:
        hbm = (dev.memory_stats() or {}).get("bytes_limit", 16 << 30)
    except Exception:  # noqa: BLE001
        hbm = 16 << 30
    return hbm / 2**30


def build_engine(batch: int, steps: int, ctx: int, keep: int, impl: str,
                 smoke: bool = False, kv_dtype: str = "bfloat16",
                 page: int = 128, method: str = "snapkv", chunk: int = 8192,
                 staging: str = "int4", model_class: str = "auto",
                 weight_quant: str = "none"):
    """Construct the bench engine (shared by the run and by
    scripts/hbm_ledger.py's AOT memory accounting). Returns
    (engine, spec, name, mode, k_disp, warmup_disp)."""
    from sparsevllm_tpu.engine.llm_engine import LLMEngine
    from sparsevllm_tpu.models.weights import init_params

    if smoke:
        name, spec = _smoke_spec()
    elif model_class == "auto":
        name, spec = _pick_spec(_hbm_gib())
    else:
        # explicit class override (north-star lane: 7b-class + fp8
        # weights fits a 16 GiB chip; BASELINE.md target config)
        name, spec = _pick_spec({"7b": 32.0, "3b": 14.0, "1b": 8.0}[
            model_class
        ])
    params = init_params(spec, seed=0, dtype="bfloat16",
                         distribution="zeros")
    if weight_quant == "fp8":
        # build the fp8 tree DIRECTLY (zeros quantize to zeros): reading
        # the synthetic bf16 zeros tree to quantize it commits ~14 GiB at
        # 7B that the axon allocator never reclaims after free — the r4
        # 7B-lane first-prefill OOM (ops/fp8.py quantize_param_tree_zeros)
        from sparsevllm_tpu.ops import fp8 as fp8_ops

        params = dict(params)
        params["layers"], _ = fp8_ops.quantize_param_tree_zeros(
            params["layers"])
        if "lm_head" in params:
            *lead, i, o = params["lm_head"].shape
            import jax.numpy as jnp

            ip, op = -(-i // 128) * 128, -(-o // 128) * 128
            params["lm_head"] = jnp.zeros(
                (*lead, ip, op), jnp.float8_e4m3fn)
            params["lm_head_sinv"] = jnp.ones(
                (*lead, ip // 128, op // 128), jnp.float32)

    warmup_disp = 4
    k_disp = 32 if not smoke else 4
    growth = steps + (warmup_disp + 1) * k_disp + page
    prompt_pages = -(-(ctx + 1) // page)
    keep_pages = -(-keep // page) + -(-growth // page) + 1
    use_staging = method == "snapkv" and staging != "none"
    streamed = False
    if use_staging:
        # staged mixed-precision prefill: the in-flight prompt lives in the
        # int4 staging pool; the MAIN (bf16) pool holds only each row's
        # compacted keep budget + decode growth. Residency check: weights
        # + staging pool + main pool must fit HBM with workspace headroom
        # — otherwise fall back to STREAMED prefill (host KV archive,
        # engine/streamed_prefill.py: device holds only keep tokens).
        num_pages = batch * keep_pages + 8
        import jax

        w_bytes = sum(
            x.nbytes for x in jax.tree_util.tree_leaves(params)
        )
        tok_b = 2 * spec.num_kv_heads * spec.head_dim * 2  # bf16 K+V
        l = spec.num_layers
        main_b = l * num_pages * page * tok_b
        sp = prompt_pages + 2
        sbits = {"int8": 8, "int4": 4, "bfloat16": 16}[staging]
        stage_b = l * sp * page * tok_b * sbits // 16
        scale_b = (4 * l * sp * spec.num_kv_heads * page * 2  # f16 planes
                   if staging != "bfloat16" else 0)
        # 0.95: the staged attention's transient is one KV block + one
        # score tile (block-scanned online softmax), not a whole-context
        # scratch — workspace headroom is small
        budget = _hbm_gib() * 2**30 * 0.95
        need = w_bytes + main_b + stage_b + scale_b
        if need > budget:
            print(f"staged plan needs {need/2**30:.1f} GiB > "
                  f"{budget/2**30:.1f} budget -> streamed prefill",
                  file=sys.stderr)
            use_staging = False
            streamed = True
    elif method == "snapkv":
        # one full prompt in flight + every row's compacted remainder
        num_pages = prompt_pages + (batch + 1) * keep_pages + 8
    elif method == "deltakv":
        full_n = 1 if spec.num_layers <= 2 else 2
        sparse_n = spec.num_layers - full_n
        growthp = -(-growth // page) + 2
        sparse_cost = 1 + -(-512 // page) + growthp + 4
        # residency ledger (VERDICT r4 #3): weights + per-row dk_state
        # (exact records are irreducible: ~336 B/token at 3B) + pools must
        # fit HBM. When the RESIDENT dense-prefill peak cannot, route
        # through the STREAMED tier (host KV archive; device holds only
        # the full observation layers + each sparse layer's sink/recent)
        # over the GLOBAL page pool — the reference's raw-kv-offload
        # posture at its 512K headline (plot_throughput_chart.py:18).
        w_bytes = sum(
            x.nbytes for x in __import__("jax").tree_util.tree_leaves(
                params)
        )
        io = 2 * spec.num_kv_heads * spec.head_dim
        lat = (io // 4)
        rec = -(-(lat // 2 + 8 * (4 * max(lat // 64, 1) // 4) + 16)
                // 512) * 512  # int4 payload + scales/zeros + fathers,
        # padded to 128 f32 WORDS (ops/deltakv._record_geometry)
        stride = 32
        dk_row = sparse_n * (ctx * rec + (ctx // stride) * io * 2)
        # int4 K+V bytes per (token, layer): nkv*dh/2 each for K and V
        tok_b = spec.num_kv_heads * spec.head_dim
        resident_pages = (
            spec.num_layers * (prompt_pages + growthp)
            + (batch - 1) * full_n * (prompt_pages + growthp)
            + batch * sparse_n * sparse_cost + 16
        ) if batch > 1 else (
            batch * (prompt_pages + -(-growth // page) + 2) + 8
        )
        # recon-cache scratch (executor auto-enables it under 1.5 GiB)
        rc_b = sparse_n * batch * keep * io * 2
        if rc_b > (1536 << 20):
            rc_b = 0
        budget = _hbm_gib() * 2**30 * 0.86  # true usable ~15.0 + temps
        need = (w_bytes + batch * dk_row + rc_b
                + resident_pages * page * tok_b * (
                    spec.num_layers if batch == 1 else 1))
        deltakv_streamed = ctx > 196608 or need > budget
        if deltakv_streamed:
            num_pages = (
                batch * full_n * (prompt_pages + growthp)
                + batch * sparse_n * sparse_cost + 16
            )
            print(f"deltakv resident plan {need/2**30:.1f} GiB > "
                  f"{budget/2**30:.1f} budget -> streamed prefill",
                  file=sys.stderr)
        elif batch > 1:
            # batch >1 resident: GLOBAL pool — one in-flight dense prefill
            # (all layers) + every other row's full-layer residency +
            # sparse tails. A per-layer pool would cost
            # batch x prompt_pages on EVERY layer.
            num_pages = resident_pages
        else:
            # per-layer pool demand = max over layers: full (observation)
            # layers hold every row's whole prompt + decode growth; the
            # sparse layers' in-flight dense-prefill peak (one prompt,
            # bs=1 long bucket) is <= that for batch >= 1
            num_pages = resident_pages
    else:
        # full residency per row (vanilla/omnikv keep everything)
        num_pages = batch * (prompt_pages + -(-growth // page)) + 8
    extra = {}
    if method == "snapkv":
        extra["prefill_keep_tokens"] = keep
    elif method == "omnikv":
        extra["full_attn_layers"] = (0, 1)
        extra["decode_keep_tokens"] = keep
    elif method == "deltakv":
        # the reference's flagship config family (deltakv + KIVI-4 pool,
        # BASELINE.md north star): 2 observation layers, top-k over int4
        # latents, fixed-stride centers. Compressor weights are random
        # (linear io->io/4): throughput is weight-value-independent, and
        # the accuracy story lives in ACCURACY.md's trained/origin lanes.
        io = 2 * spec.num_kv_heads * spec.head_dim
        extra["full_attn_layers"] = (
            (0,) if spec.num_layers <= 2 else (0, spec.num_layers // 2)
        )
        extra["decode_keep_tokens"] = keep
        extra["deltakv_cluster_ratio"] = 1.0 / 32  # centers = bf16 raw
        # KV at 1/stride density: stride 32 keeps the 128K center pool at
        # ~0.4 GiB next to weights+pool+latents on a 16 GiB chip
        extra["deltakv_max_compressed_tokens"] = ctx
        extra["deltakv_latent_dim"] = io // 4
        extra["deltakv_latent_group"] = min(64, io // 4)
        if deltakv_streamed:
            extra["global_kv_pool"] = True
            extra["long_prefill_offload_threshold"] = max(chunk * 2, 16384)
        elif batch > 1:
            extra["global_kv_pool"] = True
            extra["long_prefill_offload_threshold"] = ctx + page
        else:
            # resident dense prefill (int4 pallas prefill kernel); the
            # host archive tier only pays off beyond-HBM (256K+)
            extra["long_prefill_offload_threshold"] = ctx + page
    if use_staging:
        extra["kv_staging_dtype"] = staging
        extra["num_staging_pages"] = prompt_pages + 2
    if streamed:
        extra["long_prefill_offload_threshold"] = chunk
    if weight_quant != "none":
        extra["weight_quantization"] = weight_quant
    if method == "deltakv":
        extra["deltakv_recon_cache"] = os.environ.get(
            "BENCH_DK_RECON", "auto")
    mode = "staged" if use_staging else (
        "streamed" if streamed or (method == "deltakv" and deltakv_streamed)
        else "resident")
    print(f"model={name} method={method} kv={kv_dtype} prefill={mode} "
          f"ctx={ctx} batch={batch}", file=sys.stderr)
    engine = LLMEngine(
        spec=spec, params=params,
        method=method if method != "vanilla" else "",
        dtype="bfloat16",
        page_size=page,
        num_kv_pages=num_pages,
        max_model_len=ctx + growth + page,
        chunk_prefill_size=chunk,
        max_num_batched_tokens=max(chunk * 2, 16384),
        max_decoding_seqs=max(batch, 1),
        max_num_seqs_in_batch=max(batch, 1),
        kv_cache_dtype=kv_dtype,
        attention_impl=impl,
        decode_context_bucket_base=1024 if not smoke else 64,
        decode_steps_per_dispatch=k_disp,
        **extra,
    )
    # drop the host-side params reference: under weight_quantization the
    # executor holds the fp8 copy and the ORIGINAL bf16 tree (15 GiB at
    # 7B) must be freeable
    del params
    return engine, spec, name, mode, k_disp, warmup_disp


def run_e2e(batch: int, steps: int, ctx: int, keep: int, impl: str,
            smoke: bool = False, kv_dtype: str = "bfloat16", page: int = 128,
            method: str = "snapkv", chunk: int = 8192,
            staging: str = "int4", model_class: str = "auto",
            weight_quant: str = "none") -> dict:
    """Honest prompt-in -> tokens-out measurement through LLMEngine."""
    engine, spec, name, mode, k_disp, warmup_disp = build_engine(
        batch, steps, ctx, keep, impl, smoke=smoke, kv_dtype=kv_dtype,
        page=page, method=method, chunk=chunk, staging=staging,
        model_class=model_class, weight_quant=weight_quant)
    try:
        return _drive_e2e(engine, spec, name, batch, steps, ctx, keep,
                          kv_dtype, method, warmup_disp, k_disp, mode)
    finally:
        engine.exit()  # release device pools even on an OOM mid-run


def _drive_e2e(engine, spec, name, batch, steps, ctx, keep, kv_dtype,
               method, warmup_disp, k_disp, mode):
    import jax

    from sparsevllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(0)
    sp = SamplingParams(
        temperature=0.0, ignore_eos=True,
        max_tokens=steps + (warmup_disp + 2) * k_disp,
    )
    for i in range(batch):
        ids = rng.integers(10, spec.vocab_size, size=ctx - 1).tolist()
        engine.add_request(prompt_token_ids=ids, sampling_params=sp)

    # ---- prefill phase (incl. compaction), all sequences ----
    t0 = time.perf_counter()
    prefill_tokens = 0
    nsteps = 0
    while any(
        not s.prefill_done for s in engine.scheduler.running
    ) or engine.scheduler.waiting:
        out = engine.step()
        nsteps += 1
        if not out:
            raise RuntimeError("engine stalled during prefill")
        for s, toks in out:
            if s.num_completion_tokens <= 1:
                prefill_tokens += 0  # counted below from prompt lens
        if nsteps % 16 == 0:
            done = sum(s.prefill_done for s in engine.scheduler.running)
            print(f"  prefill step {nsteps}: {done}/{batch} prompts done",
                  file=sys.stderr)
    jax.block_until_ready(engine.executor.k_cache)
    prefill_wall = time.perf_counter() - t0
    prefill_tokens = batch * (ctx - 1)
    prefill_tok_s = prefill_tokens / prefill_wall

    # ---- decode phase: warmup dispatches, then timed ----
    for _ in range(warmup_disp):
        engine.step()
    jax.block_until_ready(engine.executor.k_cache)
    t0 = time.perf_counter()
    decode_tokens = 0
    while decode_tokens < batch * steps:
        out = engine.step()
        if not out:
            break
        decode_tokens += sum(len(t) for _, t in out)
    jax.block_until_ready(engine.executor.k_cache)
    dt = time.perf_counter() - t0
    tok_s = decode_tokens / dt
    suffix = "" if kv_dtype in ("auto", "bfloat16", "float32") \
        else f"_{kv_dtype}"
    return {
        "metric": f"decode_tok_s_{ctx // 1024}k_{method}{suffix}_e2e",
        "value": round(tok_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / BASELINE_TOK_S, 3),
        "e2e": True,
        "prefill_tok_s": round(prefill_tok_s, 1),
        "prefill_wall_s": round(prefill_wall, 1),
        "config": {
            "model": name, "batch": batch, "ctx": ctx, "keep": keep,
            "kv_dtype": kv_dtype, "decode_steps": steps,
            "prefill_mode": mode,
        },
    }


def run_synthetic(batch: int, steps: int, ctx: int, keep: int, impl: str,
                  smoke: bool = False, kv_dtype: str = "auto",
                  page: int = 128, method: str = "snapkv") -> dict:
    """Decode-only over SYNTHESIZED post-compaction state (no real
    prefill) — a kernel-level diagnostic, NOT the headline. The metric name
    carries the _synthetic suffix so it can never be mistaken for E2E."""
    import jax

    from sparsevllm_tpu.config import Config
    from sparsevllm_tpu.engine.executor import ModelExecutor
    from sparsevllm_tpu.engine.kv_manager.base import KVCacheManager
    from sparsevllm_tpu.engine.sequence import Sequence
    from sparsevllm_tpu.models.weights import init_params
    from sparsevllm_tpu.sampling_params import SamplingParams

    name, spec = _smoke_spec() if smoke else _pick_spec(_hbm_gib())
    print(f"[synthetic] model={name}", file=sys.stderr)

    warmup_tokens = 4 * 32
    resident = keep if method == "snapkv" else ctx
    pages_per_seq = -(-(resident + steps + warmup_tokens + page) // page)
    num_pages = batch * pages_per_seq + 2
    extra = {}
    if method == "snapkv":
        extra["prefill_keep_tokens"] = keep
    elif method == "omnikv":
        extra["full_attn_layers"] = (0, 1)
        extra["decode_keep_tokens"] = keep
    cfg = Config(
        method=method if method != "vanilla" else "",
        dtype="bfloat16",
        page_size=page,
        num_kv_pages=num_pages,
        max_model_len=ctx + steps + page,
        chunk_prefill_size=8192,
        max_num_batched_tokens=65536,
        max_decoding_seqs=max(batch, 1),
        max_num_seqs_in_batch=max(batch, 1),
        kv_cache_dtype=kv_dtype,
        attention_impl=impl,
        decode_context_bucket_base=1024,
        decode_steps_per_dispatch=32,
        **extra,
    )
    params = init_params(spec, seed=0, dtype="bfloat16",
                         distribution="zeros")
    ex = ModelExecutor(cfg, spec, params, num_pages, batch)
    kv = KVCacheManager.create(cfg, spec.num_layers, num_pages, batch)

    seqs = []
    for _ in range(batch):
        s = Sequence([1] * ctx, SamplingParams(temperature=0.0,
                                               max_tokens=steps + 16))
        kv.alloc_row(s)
        kv.alloc_prefill(s, resident)
        s.num_prefilled_tokens = ctx
        s.completion_token_ids.append(1)
        seqs.append(s)

    rows = kv.rows_of(seqs)
    k = cfg.decode_steps_per_dispatch

    def one_dispatch():
        dest, ctx_start = kv.alloc_decode(seqs, k)
        ex.apply_table_updates(kv.drain_table_updates())
        toks = ex.run_decode(seqs, dest, ctx_start, rows)  # [B, k]
        for s, row in zip(seqs, toks):
            s.completion_token_ids.extend(int(t) for t in row)

    for _ in range(4):
        one_dispatch()
    jax.block_until_ready(ex.k_cache)
    n_dispatch = max(steps // k, 1)
    t0 = time.perf_counter()
    for _ in range(n_dispatch):
        one_dispatch()
    jax.block_until_ready(ex.k_cache)
    dt = time.perf_counter() - t0
    tok_s = batch * n_dispatch * k / dt
    sfx = "" if kv_dtype in ("auto", "bfloat16", "float32") \
        else f"_{kv_dtype}"
    return {
        "metric": f"decode_tok_s_{ctx // 1024}k_{method}{sfx}_synthetic",
        "value": round(tok_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / BASELINE_TOK_S, 3),
        "e2e": False,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--ctx", type=int, default=131072)
    ap.add_argument("--keep", type=int, default=4608)  # keep + recent window
    ap.add_argument("--impl", default="auto")
    ap.add_argument("--page", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--method", default="snapkv",
                    help="snapkv | omnikv | vanilla | deltakv")
    ap.add_argument("--kv-dtype", default="bfloat16",
                    help="bfloat16 (default; int4-staged prefill keeps "
                         "decode residency tiny) | int8 | int4")
    ap.add_argument("--model-class", default="auto",
                    help="auto (fit to HBM) | 7b | 3b | 1b")
    ap.add_argument("--weight-quant", default="none",
                    help="none | fp8 (block-scaled fp8 weight storage; "
                         "the 7b-class north-star lane needs it on 16 GiB)")
    ap.add_argument("--staging", default="int4",
                    help="staged-prefill pool dtype for snapkv "
                         "(int4 | int8 | bfloat16 | none). Only applies "
                         "when kv-dtype is a float type.")
    ap.add_argument("--synthetic", action="store_true",
                    help="decode-only over synthesized compacted state "
                         "(kernel diagnostic; metric gets _synthetic)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU smoke run (shapes only)")
    args = ap.parse_args()
    if args.smoke:
        args.batch, args.steps, args.ctx, args.keep = 2, 8, 2048, 256
        args.chunk = 512
    result = None
    last_err = None
    # transient "TPU backend error (Internal)" happens when a prior process
    # was killed mid-dispatch; a fresh attempt after a pause recovers.
    for attempt, impl in enumerate([args.impl, args.impl]):
        try:
            if args.synthetic:
                result = run_synthetic(
                    args.batch, args.steps, args.ctx, args.keep, impl,
                    smoke=args.smoke, kv_dtype=args.kv_dtype,
                    page=args.page, method=args.method)
            else:
                staging = args.staging
                if args.kv_dtype not in ("auto", "bfloat16", "float32"):
                    staging = "none"
                result = run_e2e(
                    args.batch, args.steps, args.ctx, args.keep, impl,
                    smoke=args.smoke, kv_dtype=args.kv_dtype,
                    page=args.page, method=args.method, chunk=args.chunk,
                    staging=staging, model_class=args.model_class,
                    weight_quant=args.weight_quant)
            break
        except Exception as e:  # noqa: BLE001
            # stringify: keeping the exception's traceback pins the failed
            # attempt's device buffers (frames -> jit operands) and OOMs
            # the retry at engine init
            last_err = RuntimeError(f"{type(e).__name__}: {e}")
            print(f"bench attempt {attempt} (impl={impl}) failed: {e!r}",
                  file=sys.stderr)
            time.sleep(10)
    if result is None:
        raise last_err
    print(json.dumps(result))


if __name__ == "__main__":
    main()
