"""MathBench-style exact-answer math evaluation (reference benchmark/
MathBench + tests/test_math_bench_eval.py).

GSM-style problems from a local jsonl ({"question": str, "answer": str} —
the final numeric answer, optionally after '####'); the score is exact
match of the LAST number in the generation, the reference's extraction
rule. --synthetic generates trivial arithmetic stand-ins.

    python -m benchmark.mathbench --model /ckpt --data /datasets/gsm.jsonl \
        --method snapkv --out math.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmark.artifacts import Artifact  # noqa: E402

PROMPT = (
    "Solve the following problem step by step. End your answer with "
    "'The answer is <number>'.\n\nProblem: {question}\n\nSolution:"
)


def extract_answer(text: str) -> str:
    """Last number in the generation (reference math eval extraction)."""
    nums = re.findall(r"-?\d+(?:\.\d+)?", text.replace(",", ""))
    return nums[-1] if nums else ""


def gold_answer(ans: str) -> str:
    if "####" in ans:
        ans = ans.split("####")[-1]
    nums = re.findall(r"-?\d+(?:\.\d+)?", ans.replace(",", ""))
    return nums[-1] if nums else ans.strip()


def answers_equal(a: str, b: str) -> bool:
    try:
        return abs(float(a) - float(b)) < 1e-6
    except ValueError:
        return a.strip() == b.strip()


def load_samples(path: str, limit: int) -> list[dict]:
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"math dataset not found: {path} (no network access; use "
            f"--synthetic to exercise the harness)"
        )
    out = []
    with open(path) as f:
        for line in f:
            if line.strip():
                out.append(json.loads(line))
            if len(out) >= limit:
                break
    return out


def synthetic_samples(n: int) -> list[dict]:
    return [
        {"question": f"What is {i + 2} plus {i + 3}?",
         "answer": f"#### {2 * i + 5}"}
        for i in range(n)
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--data", default="")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--samples", type=int, default=100)
    ap.add_argument("--method", default="")
    ap.add_argument("--max-tokens", type=int, default=512)
    ap.add_argument("--out", required=True)
    ap.add_argument("--engine-kwargs", default="{}")
    args = ap.parse_args()

    from sparsevllm_tpu import SamplingParams
    from sparsevllm_tpu.engine.llm_engine import LLMEngine

    kwargs = json.loads(args.engine_kwargs)
    if args.method:
        kwargs["sparse_method"] = args.method
    art = Artifact("mathbench", {
        "model": args.model, "method": args.method or "vanilla",
        "samples": args.samples, "synthetic": args.synthetic,
    })
    engine = LLMEngine(model=args.model, **kwargs)
    if engine.tokenizer is None:
        raise RuntimeError("mathbench needs a real tokenizer")
    samples = (
        synthetic_samples(args.samples) if args.synthetic
        else load_samples(args.data, args.samples)
    )
    correct = 0
    error = None
    try:
        for i, sample in enumerate(samples):
            outs = engine.generate(
                prompts=[PROMPT.format(question=sample["question"])],
                sampling_params=SamplingParams(
                    temperature=0.0, max_tokens=args.max_tokens),
            )
            pred = extract_answer(outs[0].text)
            gold = gold_answer(sample["answer"])
            ok = answers_equal(pred, gold) if pred else False
            correct += ok
            art.add_raw({"idx": i, "pred": pred, "gold": gold, "ok": ok})
    except Exception as e:  # noqa: BLE001
        error = repr(e)
        raise
    finally:
        agg = {"accuracy": round(100.0 * correct / max(len(samples), 1), 2)}
        art.finish(agg, error=error)
        art.save(args.out)
        print(json.dumps(agg))
        engine.exit()


if __name__ == "__main__":
    main()
