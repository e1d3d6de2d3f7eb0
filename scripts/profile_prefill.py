"""On-chip prefill-step probe: compile + time + check for cache-sized copies.

Usage: python scripts/profile_prefill.py [--dh 128] [--nkv 8] [--pages 770]
Reports compiled temp-allocation size (a full-cache copy shows up as a
cache-sized temp) and per-chunk wall time at 3B-like shapes.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from sparsevllm_tpu.config import Config  # noqa: E402
from sparsevllm_tpu.engine.executor import ModelExecutor  # noqa: E402
from sparsevllm_tpu.engine.kv_manager.base import KVCacheManager  # noqa: E402
from sparsevllm_tpu.engine.sequence import Sequence  # noqa: E402
from sparsevllm_tpu.models.spec import ModelSpec  # noqa: E402
from sparsevllm_tpu.models.weights import init_params  # noqa: E402
from sparsevllm_tpu.sampling_params import SamplingParams  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=3072)
    ap.add_argument("--nq", type=int, default=24)
    ap.add_argument("--nkv", type=int, default=8)
    ap.add_argument("--dh", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--prompt", type=int, default=32768)
    ap.add_argument("--page", type=int, default=64)
    ap.add_argument("--impl", default="auto")
    ap.add_argument("--kv-dtype", default="auto")
    args = ap.parse_args()

    spec = ModelSpec(
        model_type="llama", num_layers=args.layers, hidden_size=args.hidden,
        num_q_heads=args.nq, num_kv_heads=args.nkv, head_dim=args.dh,
        intermediate_size=8192, vocab_size=32000, rms_norm_eps=1e-5,
        rope_theta=500000.0, max_position_embeddings=131072,
        tie_word_embeddings=True,
    )
    pages = -(-(args.prompt + args.page) // args.page) + 2
    cfg = Config(
        method="", dtype="bfloat16", page_size=args.page, num_kv_pages=pages,
        max_model_len=args.prompt + 64, chunk_prefill_size=args.chunk,
        max_num_batched_tokens=max(args.chunk, 8192),
        max_decoding_seqs=1, max_num_seqs_in_batch=1,
        kv_cache_dtype=args.kv_dtype, attention_impl=args.impl,
    )
    params = init_params(spec, seed=0, dtype="bfloat16",
                         distribution="zeros")
    ex = ModelExecutor(cfg, spec, params, pages, 1)
    kv = KVCacheManager.create(cfg, spec.num_layers, pages, 1)
    print(f"cache bytes={ex.k_cache.nbytes * 2 / 2**30:.2f} GiB "
          f"pages={pages}", file=sys.stderr)

    s = Sequence([1] * args.prompt, SamplingParams(max_tokens=4))
    kv.alloc_row(s)
    times = []
    while not s.prefill_done:
        chunk = min(args.chunk, s.remaining_prefill)
        dest = kv.alloc_prefill(s, chunk)
        ex.apply_table_updates(kv.drain_table_updates())
        t0 = time.perf_counter()
        ctx_tok = np.asarray([s.num_prefilled_tokens + chunk], np.int32)
        tok, obs = ex.run_prefill(
            [s], [chunk], [dest], kv.rows_of([s]), ctx_tok)
        _ = np.asarray(tok)  # sync
        dt = time.perf_counter() - t0
        s.num_prefilled_tokens += chunk
        times.append(dt)
        print(f"chunk {chunk}: {dt * 1e3:.1f} ms", file=sys.stderr)
    steady = times[2:] or times
    tot_tok = args.prompt
    print(
        f"prefill {args.prompt} tokens in {sum(times):.2f}s "
        f"({tot_tok / sum(times):.0f} tok/s); steady chunk "
        f"{np.mean(steady) * 1e3:.0f} ms "
        f"({args.chunk / np.mean(steady):.0f} tok/s)"
    )


if __name__ == "__main__":
    main()
