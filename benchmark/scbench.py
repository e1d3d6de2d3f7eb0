"""SCBench-style shared-context multi-turn runner (reference benchmark/
SCBench + regression "scbench" block: multi-turn requests over one long
shared context, run WITH the prefix cache so turns 2..N reuse the turn-1
KV).

Datasets load from a local jsonl ({"context": str, "turns": [{"input",
"answers"}], "task": str}); --synthetic builds self-checking stand-ins.
Reports per-turn scores plus prefix-cache effectiveness (tokens reused /
prompt tokens) — the quantity the reference's scbench layer regresses.

    python -m benchmark.scbench --model /ckpt --data /datasets/scbench.jsonl \
        --method quest --out scbench.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmark.artifacts import Artifact  # noqa: E402
from benchmark.metrics import qa_f1_score  # noqa: E402


def load_samples(path: str, limit: int) -> list[dict]:
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"SCBench dataset not found: {path} (no network access in this "
            f"environment; use --synthetic to exercise the harness)"
        )
    out = []
    with open(path) as f:
        for line in f:
            if line.strip():
                out.append(json.loads(line))
            if len(out) >= limit:
                break
    return out


def synthetic_samples(n: int, turns: int) -> list[dict]:
    out = []
    for i in range(n):
        facts = {f"item-{j}": f"value-{i}-{j}" for j in range(turns)}
        ctx = " ".join(
            f"Record: the content of {k} is {v}." for k, v in facts.items()
        ) + " " + " ".join("Padding sentence number %d." % j
                           for j in range(40))
        out.append({
            "task": "kv_retrieval",
            "context": ctx,
            "turns": [
                {"input": f"What is the content of item-{j}? Answer:",
                 "answers": [facts[f"item-{j}"]]}
                for j in range(turns)
            ],
        })
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--data", default="")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--samples", type=int, default=20)
    ap.add_argument("--turns", type=int, default=3)
    ap.add_argument("--method", default="")
    ap.add_argument("--out", required=True)
    ap.add_argument("--engine-kwargs", default="{}")
    args = ap.parse_args()

    from sparsevllm_tpu import SamplingParams
    from sparsevllm_tpu.engine.llm_engine import LLMEngine

    kwargs = json.loads(args.engine_kwargs)
    if args.method:
        kwargs["sparse_method"] = args.method
    kwargs.setdefault("enable_prefix_cache", True)
    art = Artifact("scbench", {
        "model": args.model, "method": args.method or "vanilla",
        "samples": args.samples, "turns": args.turns,
        "synthetic": args.synthetic,
    })
    engine = LLMEngine(model=args.model, **kwargs)
    if engine.tokenizer is None:
        raise RuntimeError("scbench needs a real tokenizer")
    samples = (
        synthetic_samples(args.samples, args.turns) if args.synthetic
        else load_samples(args.data, args.samples)
    )
    scores = []
    prompt_tokens = reused_tokens = 0
    error = None
    try:
        for si, sample in enumerate(samples):
            for ti, turn in enumerate(sample["turns"]):
                prompt = sample["context"] + "\n\n" + turn["input"]
                n_prompt = len(engine.tokenizer.encode(prompt))
                stats_before = engine.prefix_cache_stats()
                outs = engine.generate(
                    prompts=[prompt],
                    sampling_params=SamplingParams(temperature=0.0,
                                                   max_tokens=32),
                )
                stats_after = engine.prefix_cache_stats()
                hit = (stats_after.get("hit_tokens", 0)
                       - stats_before.get("hit_tokens", 0))
                prompt_tokens += n_prompt
                reused_tokens += hit
                sc = max(
                    qa_f1_score(outs[0].text, a) for a in turn["answers"]
                )
                scores.append(sc)
                art.add_raw({
                    "sample": si, "turn": ti, "score": sc,
                    "prompt_tokens": n_prompt, "prefix_hit_tokens": hit,
                })
    except Exception as e:  # noqa: BLE001
        error = repr(e)
        raise
    finally:
        agg = {
            "average_score": round(
                100.0 * sum(scores) / max(len(scores), 1), 2),
            "prefix_reuse_ratio": round(
                reused_tokens / max(prompt_tokens, 1), 4),
        }
        art.finish(agg, error=error)
        art.save(args.out)
        print(json.dumps(agg))
        engine.exit()


if __name__ == "__main__":
    main()
