"""RULER variable-tracking (VT) synthetic long-context benchmark.

Reference counterpart: benchmark/ RULER-VT runner (benchmark/README.md:7-21).
Chains of variable assignments (``VAR X1 = 12345``, ``VAR X2 = X1``, ...)
are buried in filler; the model must resolve the final value of a chain.
Synthetic end to end — no dataset needed.

    python -m benchmark.ruler_vt --model /ckpt --method quest \
        --lengths 8192 --hops 2,4 --out vt.json
"""

from __future__ import annotations

import argparse
import re
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmark.artifacts import Artifact  # noqa: E402
from benchmark.niah import FILLERS  # noqa: E402


def build_case(rng, tokenizer, ctx_tokens: int, hops: int):
    value = str(rng.integers(10000, 99999))
    names = [f"X{rng.integers(100, 999)}{i}" for i in range(hops)]
    statements = [f"VAR {names[0]} = {value} ."]
    statements += [
        f"VAR {names[i]} = {names[i - 1]} ." for i in range(1, hops)
    ]
    body = []
    while True:
        body.append(str(rng.choice(FILLERS)))
        if len(tokenizer.encode(" ".join(body))) >= ctx_tokens - 96:
            break
    # scatter assignment statements through the haystack, in order
    n = len(body)
    for i, st in enumerate(statements):
        body.insert(int(n * (i + 1) / (hops + 1)), st)
    question = (
        f"\n\nQuestion: What is the numeric value of {names[-1]}? "
        f"Answer with only the digits.\nAnswer:"
    )
    return " ".join(body) + question, value


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="")
    ap.add_argument("--method", default="")
    ap.add_argument("--lengths", default="2048,8192")
    ap.add_argument("--hops", default="2,4")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--out", required=True)
    ap.add_argument("--engine-kwargs", default="{}")
    args = ap.parse_args()

    import json

    from sparsevllm_tpu import SamplingParams
    from sparsevllm_tpu.engine.llm_engine import LLMEngine

    lengths = [int(x) for x in args.lengths.split(",")]
    hops_list = [int(x) for x in args.hops.split(",")]
    kwargs = json.loads(args.engine_kwargs)
    if args.method:
        kwargs["sparse_method"] = args.method
    kwargs.setdefault("max_model_len", max(lengths) + 128)

    art = Artifact("ruler_vt", {
        "model": args.model, "method": args.method or "vanilla",
        "lengths": lengths, "hops": hops_list, "samples": args.samples,
    })
    engine = LLMEngine(model=args.model, **kwargs)
    if engine.tokenizer is None:
        raise SystemExit("ruler_vt needs a real tokenizer (use --model)")
    rng = np.random.default_rng(0)
    hits = total = 0
    error = None
    try:
        for ctx in lengths:
            for hops in hops_list:
                cell = 0
                for _ in range(args.samples):
                    prompt, value = build_case(
                        rng, engine.tokenizer, ctx, hops
                    )
                    outs = engine.generate(
                        prompts=[prompt],
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=16
                        ),
                    )
                    m = re.search(r"\d{4,}", outs[0].text)
                    hit = bool(m) and m.group(0) == value
                    cell += hit
                    art.add_raw({
                        "ctx": ctx, "hops": hops, "expected": value,
                        "answer": m.group(0) if m else "", "hit": hit,
                    })
                hits += cell
                total += args.samples
                art.add_parsed({
                    "cell": f"ctx{ctx}_h{hops}",
                    "accuracy": cell / args.samples,
                })
    except Exception as e:  # noqa: BLE001
        error = repr(e)
        raise
    finally:
        art.finish({"accuracy": hits / max(total, 1), "total": total}, error)
        art.save(args.out)


if __name__ == "__main__":
    main()
