"""Needle-in-a-haystack (NIAH) long-context retrieval benchmark.

Reference counterpart: benchmark/ NIAH runner (benchmark/README.md:7-21).
Fully synthetic — no dataset download needed: a haystack of filler sentences
hides "The secret number for <key> is <digits>." at a configurable depth;
the model is asked to produce the digits. Scores exact-match accuracy over a
(context length x depth) grid per sparse method.

Needs a REAL tokenizer+model to be meaningful; with --tiny-random it runs
the machinery end-to-end (score is meaningless, useful as a stress test).

    python -m benchmark.niah --model /ckpt --method snapkv \
        --lengths 8192,32768 --depths 0.1,0.5,0.9 --out niah.json
"""

from __future__ import annotations

import argparse
import re
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmark.artifacts import Artifact  # noqa: E402

FILLERS = [
    "The sky was painted in soft shades of amber as evening settled in.",
    "Economists continue to debate the long-term effects of the policy.",
    "The recipe calls for two cups of flour and a pinch of salt.",
    "Migration patterns shift subtly with each passing decade.",
    "A well-tuned engine hums with a steady, reassuring rhythm.",
    "The museum's newest exhibit features early cartographic art.",
    "Rainfall totals this season exceeded the historical average.",
    "The committee adjourned without reaching a final decision.",
]


def build_case(rng, tokenizer, ctx_tokens: int, depth: float):
    key = f"case-{rng.integers(1000, 9999)}"
    secret = str(rng.integers(100000, 999999))
    needle = f" The secret number for {key} is {secret}. "
    question = (
        f"\n\nQuestion: What is the secret number for {key}? "
        f"Answer with only the digits.\nAnswer:"
    )
    body = []
    # grow the haystack until the target token budget is met
    while True:
        body.append(str(rng.choice(FILLERS)))
        text = " ".join(body)
        if len(tokenizer.encode(text)) >= ctx_tokens - 64:
            break
    pos = int(len(body) * depth)
    body.insert(pos, needle)
    prompt = " ".join(body) + question
    return prompt, secret


def extract_digits(text: str) -> str:
    m = re.search(r"\d{4,}", text)
    return m.group(0) if m else ""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="")
    ap.add_argument("--tiny-random", action="store_true")
    ap.add_argument("--method", default="")
    ap.add_argument("--lengths", default="2048,8192")
    ap.add_argument("--depths", default="0.1,0.5,0.9")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--out", required=True)
    ap.add_argument("--engine-kwargs", default="{}")
    args = ap.parse_args()

    import json

    from sparsevllm_tpu import SamplingParams
    from sparsevllm_tpu.engine.llm_engine import LLMEngine

    lengths = [int(x) for x in args.lengths.split(",")]
    depths = [float(x) for x in args.depths.split(",")]
    kwargs = json.loads(args.engine_kwargs)
    if args.method:
        kwargs["sparse_method"] = args.method
    if args.tiny_random:
        kwargs.setdefault("tiny_random", True)
        kwargs.setdefault("dtype", "float32")
        kwargs.setdefault("page_size", 8)
        kwargs.setdefault("chunk_prefill_size", 64)
        kwargs.setdefault("decode_context_bucket_base", 64)
        kwargs.setdefault("max_model_len", max(lengths) + 128)

    art = Artifact("niah", {
        "model": args.model or "tiny-random",
        "method": args.method or "vanilla",
        "lengths": lengths, "depths": depths, "samples": args.samples,
    })
    engine = LLMEngine(model=args.model, **kwargs)
    rng = np.random.default_rng(0)
    hits = total = 0
    error = None
    try:
        for ctx in lengths:
            for depth in depths:
                cell_hits = 0
                for _ in range(args.samples):
                    if engine.tokenizer is None:
                        # tiny-random: synthetic token ids, machinery only
                        prompt_ids = rng.integers(
                            3, engine.spec.vocab_size, ctx
                        ).tolist()
                        secret = "000000"
                        outs = engine.generate(
                            prompt_token_ids=[prompt_ids],
                            sampling_params=SamplingParams(
                                temperature=0.0, max_tokens=8,
                                ignore_eos=True,
                            ),
                        )
                        answer = ""
                    else:
                        prompt, secret = build_case(
                            rng, engine.tokenizer, ctx, depth
                        )
                        outs = engine.generate(
                            prompts=[prompt],
                            sampling_params=SamplingParams(
                                temperature=0.0, max_tokens=16,
                            ),
                        )
                        answer = extract_digits(outs[0].text)
                    hit = answer == secret
                    cell_hits += hit
                    art.add_raw({
                        "ctx": ctx, "depth": depth, "secret": secret,
                        "answer": answer, "hit": hit,
                    })
                hits += cell_hits
                total += args.samples
                art.add_parsed({
                    "cell": f"ctx{ctx}_d{depth}",
                    "accuracy": cell_hits / args.samples,
                })
                print(f"ctx={ctx} depth={depth}: "
                      f"{cell_hits}/{args.samples}")
    except Exception as e:  # noqa: BLE001
        error = repr(e)
        raise
    finally:
        art.finish({"accuracy": hits / max(total, 1), "total": total}, error)
        art.save(args.out)


if __name__ == "__main__":
    main()
