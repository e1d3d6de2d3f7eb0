"""On-chip staged-prefill probe: time chunk steps of the int4-staging path.

The r3 headline lane prefills 128K prompts through the staged pool at only
~450 tok/s (~6.5% MFU). This script times run_prefill_staged chunk steps
at configurable depth so kernel-structure changes (q-tile size, loop
order, score dtype) can be A/B'd in minutes instead of 40-minute bench
runs. Uses a reduced layer count — attention structure per layer is what
is being measured; tok/s extrapolates by layers.

Usage:
  SPARSEVLLM_STAGED_QB=512 python scripts/profile_prefill_staged.py \
      [--layers 8] [--prompt 65536] [--chunk 8192] [--staging int4]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from sparsevllm_tpu.engine.llm_engine import LLMEngine  # noqa: E402
from sparsevllm_tpu.models.spec import ModelSpec  # noqa: E402
from sparsevllm_tpu.models.weights import init_params  # noqa: E402
from sparsevllm_tpu.sampling_params import SamplingParams  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=65536)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--staging", default="int4")
    ap.add_argument("--keep", type=int, default=4608)
    ap.add_argument("--page", type=int, default=128)
    args = ap.parse_args()

    spec = ModelSpec(
        model_type="llama", num_layers=args.layers, hidden_size=3072,
        num_q_heads=24, num_kv_heads=8, head_dim=128,
        intermediate_size=8192, vocab_size=128256, rms_norm_eps=1e-5,
        rope_theta=500000.0, max_position_embeddings=131072,
        tie_word_embeddings=True,
    )
    params = init_params(spec, seed=0, dtype="bfloat16",
                         distribution="zeros")
    p = args.page
    prompt_pages = -(-(args.prompt + 1) // p)
    keep_pages = -(-args.keep // p) + 4
    eng = LLMEngine(
        spec=spec, params=params, method="snapkv", dtype="bfloat16",
        page_size=p, num_kv_pages=2 * keep_pages + 8,
        max_model_len=args.prompt + 512,
        chunk_prefill_size=args.chunk,
        max_num_batched_tokens=max(args.chunk * 2, 16384),
        max_decoding_seqs=1, max_num_seqs_in_batch=1,
        kv_cache_dtype="bfloat16", prefill_keep_tokens=args.keep,
        kv_staging_dtype=args.staging,
        num_staging_pages=prompt_pages + 2,
        staging_threshold_tokens=args.chunk,
        decode_context_bucket_base=1024, decode_steps_per_dispatch=4,
    )
    rng = np.random.default_rng(0)
    prompt = rng.integers(10, 100000, args.prompt).tolist()
    eng.add_request(prompt_token_ids=prompt,
                    sampling_params=SamplingParams(
                        temperature=0.0, max_tokens=2))
    seq = next(iter(eng._seqs.values()))
    assert seq.staged_prefill, "prompt did not route to the staged pool"
    times = []
    while seq.num_prefilled_tokens < args.prompt:
        done_before = seq.num_prefilled_tokens
        t0 = time.perf_counter()
        eng.step()
        dt = time.perf_counter() - t0
        c = seq.num_prefilled_tokens - done_before
        if c <= 0:
            break
        times.append((done_before + c, c, dt))
        print(f"ctx {done_before + c:>7}: chunk {c} in {dt*1e3:8.1f} ms "
              f"({c/dt:,.0f} tok/s)", file=sys.stderr)
    # steady-state = second half (past compile + shallow-context chunks)
    tail = times[len(times) // 2:]
    tok = sum(c for _, c, _ in tail)
    sec = sum(t for _, _, t in tail)
    full_eq = tok / sec * args.layers / 28  # extrapolate to 28 layers
    print(f"tail {tok} tokens in {sec:.2f}s = {tok/sec:,.0f} tok/s "
          f"at {args.layers} layers (~{full_eq:,.0f} tok/s at 28)")
    eng.exit()


if __name__ == "__main__":
    main()
