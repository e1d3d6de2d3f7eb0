"""Regression suite runner (reference benchmark/sparsevllm_regression/run_suite.py).

Blocks (manifest.json): logits parity, per-method E2E, memory savings,
stress (concurrent dispatcher), and — when a real model is configured via
env — the perf matrix. Exit code 0 iff every enabled block passes.

    python -m benchmark.regression.run_suite --out regression.json
    SPARSEVLLM_TPU_REGRESSION_MODEL=/ckpt python -m benchmark.regression.run_suite --blocks performance
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 3)[0])

from benchmark.artifacts import Artifact  # noqa: E402

TINY_KW = dict(
    tiny_random=True, dtype="float32", page_size=8, num_kv_pages=512,
    max_model_len=768, chunk_prefill_size=64, max_num_batched_tokens=512,
    max_num_seqs_in_batch=8, max_decoding_seqs=16,
    decode_context_bucket_base=64, decode_steps_per_dispatch=4,
)

METHOD_KW = {
    "": {},
    "streamingllm": {"sink_keep_tokens": 8, "recent_keep_tokens": 32},
    "snapkv": {"prefill_keep_tokens": 96, "snapkv_obs_window": 16,
               "sink_keep_tokens": 8, "recent_keep_tokens": 16},
    "pyramidkv": {"prefill_keep_tokens": 96, "snapkv_obs_window": 16,
                  "pyramidkv_beta": 4, "sink_keep_tokens": 8,
                  "recent_keep_tokens": 16},
    "omnikv": {"full_attention_layers": (0,), "decode_keep_tokens": 32,
               "sink_keep_tokens": 8, "recent_keep_tokens": 16},
    "quest": {"quest_page_size": 8, "quest_skip_layers": 1,
              "decode_keep_tokens": 64, "sink_keep_tokens": 8,
              "recent_keep_tokens": 16},
    "rkv": {"prefill_keep_tokens": 96, "snapkv_obs_window": 16,
            "decode_keep_tokens": 32, "rkv_compression_interval": 8,
            "rkv_query_cache_size": 8, "sink_keep_tokens": 8,
            "recent_keep_tokens": 16},
    "skipkv": {"prefill_keep_tokens": 96, "snapkv_obs_window": 16,
               "decode_keep_tokens": 32, "rkv_compression_interval": 8,
               "rkv_query_cache_size": 8, "skipkv_delimiter_tokens": (7, 13),
               "sink_keep_tokens": 8, "recent_keep_tokens": 16},
    "deltakv": {"full_attention_layers": (0,), "deltakv_cluster_ratio": 0.25,
                "deltakv_max_compressed_tokens": 512,
                "decode_keep_tokens": 32, "sink_keep_tokens": 8,
                "recent_keep_tokens": 16},
}


def block_logits(manifest) -> dict:
    """Teacher-forced engine-vs-HF parity (reference 'logits' block)."""
    import torch

    from sparsevllm_tpu import SamplingParams
    from sparsevllm_tpu.engine.llm_engine import LLMEngine
    from sparsevllm_tpu.utils.tiny_random import (
        build_tiny_hf_model, tiny_config,
    )

    cfg = tiny_config(None)
    _, hf = build_tiny_hf_model(cfg, 0)
    engine = LLMEngine(**TINY_KW)
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, cfg["vocab_size"], 100).tolist()
    outs = engine.generate(
        prompt_token_ids=[prompt],
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=manifest["logits"]["steps"],
            ignore_eos=True,
        ),
    )
    got = outs[0].output_token_ids
    import torch as _t

    ids = list(prompt)
    want = []
    with _t.no_grad():
        for _ in range(manifest["logits"]["steps"]):
            t = int(hf(_t.tensor([ids])).logits[0, -1].argmax())
            want.append(t)
            ids.append(t)
    ok = got == want
    return {"pass": ok, "engine": got, "hf": want}


def block_methods(manifest) -> dict:
    from sparsevllm_tpu import SamplingParams
    from sparsevllm_tpu.engine.llm_engine import LLMEngine

    results = {}
    rng = np.random.default_rng(1)
    prompt = rng.integers(3, 500, 200).tolist()
    for method in manifest["methods"]["list"]:
        kw = dict(TINY_KW)
        kw.update(METHOD_KW.get(method, {}))
        if method:
            kw["sparse_method"] = method
        try:
            eng = LLMEngine(**kw)
            outs = eng.generate(
                prompt_token_ids=[prompt],
                sampling_params=SamplingParams(
                    temperature=0.0, max_tokens=8, ignore_eos=True
                ),
            )
            n = len(outs[0].output_token_ids)
            results[method or "vanilla"] = {"pass": n == 8, "tokens": n}
        except Exception as e:  # noqa: BLE001
            results[method or "vanilla"] = {"pass": False, "error": repr(e)}
    return {
        "pass": all(r["pass"] for r in results.values()),
        "methods": results,
    }


def block_memory(manifest) -> dict:
    """Eviction methods must hit the expected KV savings."""
    from sparsevllm_tpu import SamplingParams
    from sparsevllm_tpu.engine.llm_engine import LLMEngine

    m = manifest["memory"]
    prompt_tokens = m["prompt_tokens"]
    rng = np.random.default_rng(2)
    prompt = rng.integers(3, 500, prompt_tokens).tolist()
    results = {}
    for method, expected in m["expected_savings"].items():
        kw = dict(TINY_KW)
        kw.update(METHOD_KW[method])
        kw["sparse_method"] = method
        eng = LLMEngine(**kw)
        sid = eng.add_request(
            prompt_token_ids=prompt,
            sampling_params=SamplingParams(temperature=0.0, max_tokens=2,
                                           ignore_eos=True),
        )
        seq = eng._seqs[sid]
        while not seq.prefill_done:
            eng.step()
        row = eng.kv.seq_rows[sid]
        resident = float(np.mean(eng.kv.row_lens[:, row]))
        savings = 1.0 - resident / prompt_tokens
        results[method] = {
            "resident_mean": resident,
            "savings": round(savings, 3),
            "pass": savings >= expected,
        }
        while eng.scheduler.has_work:
            eng.step()
    return {"pass": all(r["pass"] for r in results.values()), **results}


def block_stress(manifest) -> dict:
    """Concurrent requests through the async dispatcher."""
    from sparsevllm_tpu.engine.llm_engine import LLMEngine
    from sparsevllm_tpu.entrypoints.openai.dispatcher import (
        AsyncEngineDispatcher,
    )
    from sparsevllm_tpu.sampling_params import SamplingParams

    st = manifest["stress"]
    eng = LLMEngine(**TINY_KW)
    disp = AsyncEngineDispatcher(eng)
    rng = np.random.default_rng(3)

    async def one(i):
        prompt = rng.integers(3, 500, st["prompt_tokens"]).tolist()
        n = 0
        async for delta in disp.submit(
            prompt, SamplingParams(temperature=0.0,
                                   max_tokens=st["max_new"],
                                   ignore_eos=True)
        ):
            n += len(delta.token_ids)
        return n

    async def run():
        return await asyncio.gather(
            *[one(i) for i in range(st["concurrent"])]
        )

    counts = asyncio.new_event_loop().run_until_complete(run())
    disp.shutdown()
    ok = all(c == st["max_new"] for c in counts)
    return {"pass": ok, "completed": len(counts),
            "tokens": sorted(set(counts))}


def block_performance(manifest) -> dict:
    model = os.environ.get(manifest["models"]["real"]["env"], "")
    if not model:
        return {"pass": True, "skipped": "no real model configured"}
    from benchmark.microbench import run_cell
    from sparsevllm_tpu.engine.llm_engine import LLMEngine

    p = manifest["performance"]
    eng = LLMEngine(model=model)
    cells = []
    for ctx in p["lengths"]:
        for b in p["batch_sizes"]:
            cells.append(run_cell(eng, ctx, b, p["max_new"],
                                  eng.spec.vocab_size))
    floor = float(os.environ.get(p["min_decode_tok_s_env"], "0"))
    best = max(c["decode_tok_s"] for c in cells)
    return {"pass": best >= floor, "best_decode_tok_s": best,
            "floor": floor, "cells": cells}


BLOCKS = {
    "logits": block_logits,
    "methods": block_methods,
    "memory": block_memory,
    "stress": block_stress,
    "performance": block_performance,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", default="logits,methods,memory,stress")
    ap.add_argument("--out", default="regression_result.json")
    args = ap.parse_args()
    manifest_path = os.path.join(os.path.dirname(__file__), "manifest.json")
    with open(manifest_path) as f:
        manifest = json.load(f)

    art = Artifact("regression", {"blocks": args.blocks})
    results = {}
    for name in args.blocks.split(","):
        print(f"=== {name} ===")
        try:
            results[name] = BLOCKS[name](manifest)
        except Exception as e:  # noqa: BLE001
            results[name] = {"pass": False, "error": repr(e)}
        print(json.dumps(results[name], indent=2, default=str))
        art.add_parsed({"block": name, "pass": results[name]["pass"]})
    ok = all(r["pass"] for r in results.values())
    art.finish({"pass": ok, "results": results})
    art.save(args.out)
    print(f"SUITE {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
