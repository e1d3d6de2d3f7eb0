"""Microbenchmark: prefill/decode throughput matrix over the real engine.

Re-expresses reference benchmark/microbench.py: a (context length x batch)
matrix per sparse method, measured through the public engine API with the
artifact schema (artifacts.py).

    python -m benchmark.microbench --tiny-random --out out.json \
        --lengths 128,256 --batch-sizes 1,2 --method snapkv
    python -m benchmark.microbench --model /ckpt --lengths 32768,65536 \
        --batch-sizes 4,8 --method snapkv --max-new 256
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmark.artifacts import Artifact  # noqa: E402


def run_cell(engine, ctx_len: int, batch: int, max_new: int, vocab: int):
    from sparsevllm_tpu import SamplingParams

    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(3, vocab, ctx_len).tolist() for _ in range(batch)
    ]
    sp = SamplingParams(temperature=0.0, max_tokens=max_new, ignore_eos=True)
    ids = [
        engine.add_request(prompt_token_ids=p, sampling_params=sp)
        for p in prompts
    ]
    t0 = time.perf_counter()
    prefill_done_at = None
    while engine.scheduler.has_work:
        engine.step()
        if prefill_done_at is None and all(
            engine._seqs[i].prefill_done for i in ids
        ):
            prefill_done_at = time.perf_counter()
    t1 = time.perf_counter()
    prefill_s = (prefill_done_at or t1) - t0
    decode_s = max(t1 - (prefill_done_at or t1), 1e-9)
    n_out = sum(len(engine._seqs[i].completion_token_ids) for i in ids)
    return {
        "ctx_len": ctx_len,
        "batch": batch,
        "prefill_tokens": ctx_len * batch,
        "prefill_s": prefill_s,
        "prefill_tok_s": ctx_len * batch / max(prefill_s, 1e-9),
        "decode_tokens": n_out,
        "decode_s": decode_s,
        "decode_tok_s": n_out / decode_s,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="")
    ap.add_argument("--tiny-random", action="store_true")
    ap.add_argument("--method", default="")
    ap.add_argument("--lengths", default="128,256")
    ap.add_argument("--batch-sizes", default="1,2")
    ap.add_argument("--max-new", type=int, default=32)
    ap.add_argument("--out", required=True)
    ap.add_argument("--engine-kwargs", default="{}")
    args = ap.parse_args()

    import json

    from sparsevllm_tpu.engine.llm_engine import LLMEngine

    lengths = [int(x) for x in args.lengths.split(",")]
    batches = [int(x) for x in args.batch_sizes.split(",")]
    kwargs = json.loads(args.engine_kwargs)
    if args.method:
        kwargs["sparse_method"] = args.method
    if args.tiny_random:
        kwargs.setdefault("tiny_random", True)
        kwargs.setdefault("dtype", "float32")
        kwargs.setdefault("page_size", 8)
        kwargs.setdefault("chunk_prefill_size", 64)
        kwargs.setdefault("max_num_batched_tokens", 512)
        kwargs.setdefault("decode_context_bucket_base", 64)
        kwargs.setdefault("max_model_len", max(lengths) + args.max_new + 64)

    art = Artifact("microbench", {
        "model": args.model or "tiny-random",
        "method": args.method or "vanilla",
        "lengths": lengths, "batches": batches, "max_new": args.max_new,
        "engine_kwargs": kwargs,
    })
    error = None
    try:
        engine = LLMEngine(model=args.model, **kwargs)
        vocab = engine.spec.vocab_size
        for ctx in lengths:
            for b in batches:
                rec = run_cell(engine, ctx, b, args.max_new, vocab)
                art.add_raw(rec)
                art.add_parsed({
                    "cell": f"ctx{ctx}_bs{b}",
                    "prefill_tok_s": round(rec["prefill_tok_s"], 1),
                    "decode_tok_s": round(rec["decode_tok_s"], 1),
                })
                print(f"ctx={ctx} bs={b}: prefill "
                      f"{rec['prefill_tok_s']:.0f} tok/s, decode "
                      f"{rec['decode_tok_s']:.1f} tok/s")
    except Exception as e:  # noqa: BLE001 — record failure in the artifact
        error = repr(e)
        raise
    finally:
        parsed = art.data["parsed"]
        agg = {}
        if parsed:
            agg = {
                "max_decode_tok_s": max(p["decode_tok_s"] for p in parsed),
                "max_prefill_tok_s": max(p["prefill_tok_s"] for p in parsed),
                "cells": len(parsed),
            }
        art.finish(agg, error)
        art.save(args.out)


if __name__ == "__main__":
    main()
