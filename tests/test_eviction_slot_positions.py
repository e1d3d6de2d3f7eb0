"""Regression: mid-prefill eviction must not corrupt later chunk stores.

A streamingllm window eviction BETWEEN prefill chunks compacts the page
table, after which a token's LOGICAL position no longer equals its
table-SLOT position. The per-layer prefill store derives pages from the
layer's table; deriving them from logical positions scattered every
post-eviction chunk's KV into never-assigned pages (reading garbage for
the rest of prefill and all of decode). Measured as recall 0.00 on the
induction oracle with a needle INSIDE the retained window.

The fix threads RESIDENT slot positions (executor.run_prefill
``slot_positions``) into the store-page derivation while RoPE keeps the
logical positions. This test drives the production engine on the
constructed induction oracle with an eviction firing mid-prefill and a
needle that the window retains: recall must be exact.
"""

import numpy as np

from benchmark import accuracy_ladder as al
from benchmark import induction_oracle as io
from sparsevllm_tpu import SamplingParams
from sparsevllm_tpu.engine.llm_engine import LLMEngine


def test_streamingllm_mid_prefill_eviction_keeps_recent_needle():
    ctx = 256
    spec = io.oracle_spec()
    params = io.build_params(0)
    rng = np.random.default_rng(42)
    cases = []
    for _ in range(2):
        full, ans_starts, vals = al.build_recall_case(rng, ctx, 0.9)
        cases.append((full[: ans_starts[0] - 1], vals[0]))

    engine = LLMEngine(
        spec=spec, params=params,
        dtype="float32",
        page_size=32,
        num_kv_pages=len(cases) * (ctx // 32 + 4) + 16,
        max_model_len=ctx + 64,
        # chunk < prompt: the window eviction fires BETWEEN chunks, so the
        # final chunk stores into a COMPACTED table (the regression case)
        chunk_prefill_size=128,
        max_num_batched_tokens=1024,
        max_decoding_seqs=len(cases),
        max_num_seqs_in_batch=len(cases),
        decode_context_bucket_base=256,
        decode_steps_per_dispatch=2,
        sparse_method="streamingllm",
        sink_keep_tokens=32,
        # window retains the depth-0.9 needle (~30 tokens from the end)
        # while forcing an eviction after chunk 1: (128 - 64)//32 = 2 > 1
        recent_keep_tokens=64,
    )
    try:
        outs = engine.generate(
            prompt_token_ids=[c[0] for c in cases],
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=2, ignore_eos=True
            ),
        )
        for out, (_, ans) in zip(outs, cases):
            want = [al.ANS_MARK] + list(ans)
            assert out.output_token_ids[:2] == want, (
                f"recall broke after mid-prefill eviction: "
                f"{out.output_token_ids[:2]} != {want}"
            )
    finally:
        engine.exit()
