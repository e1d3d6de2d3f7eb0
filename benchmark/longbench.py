"""LongBench quality runner (local datasets; reference benchmark/ LongBench).

The reference's regression "quality" layer runs a LongBench-mini subset
(qasper, hotpotqa, multi_news, trec, passage_retrieval_en, lcc) and requires
the vanilla average >= 55.0 (benchmark/sparsevllm_regression/manifest.json).
This runner mirrors that: datasets load from a LOCAL directory of jsonl
files ({task}.jsonl, each line {"input", "context", "answers", "length",
"all_classes", ...} — the HF LongBench export format); there is no network
access in this environment, so a missing dataset is a LOUD error, and
--synthetic generates tiny self-checking stand-ins to exercise the harness.

    python -m benchmark.longbench --model /ckpt --data /datasets/longbench \
        --tasks qasper,hotpotqa --method snapkv --out longbench.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmark.artifacts import Artifact  # noqa: E402
from benchmark.metrics import score_sample  # noqa: E402

# reference LongBench-mini subset + per-task generation lengths
TASK_MAX_GEN = {
    "narrativeqa": 128, "qasper": 128, "multifieldqa_en": 64,
    "hotpotqa": 32, "2wikimqa": 32, "musique": 32,
    "gov_report": 512, "qmsum": 512, "multi_news": 512,
    "trec": 64, "triviaqa": 32, "samsum": 128,
    "passage_retrieval_en": 32, "passage_count": 32,
    "lcc": 64, "repobench-p": 64,
}

TASK_PROMPT = {
    "qasper": (
        "You are given a scientific article and a question. Answer the "
        "question based on the article.\n\nArticle: {context}\n\n"
        "Question: {input}\n\nAnswer:"
    ),
    "hotpotqa": (
        "Answer the question based on the given passages.\n\n"
        "{context}\n\nQuestion: {input}\nAnswer:"
    ),
    "multi_news": (
        "You are given several news passages. Write a one-page summary of "
        "all news.\n\nNews:\n{context}\n\nSummary:"
    ),
    "trec": (
        "Please determine the type of the question below. Here are some "
        "examples of questions.\n\n{context}\n{input}"
    ),
    "passage_retrieval_en": (
        "Here are 30 paragraphs, followed by an abstract of one of them. "
        "Determine which paragraph the abstract is from.\n\n{context}\n\n"
        "The abstract is: {input}\n\nThe answer is: "
    ),
    "lcc": "Please complete the code given below.\n{context}Next line of code:\n",
}
DEFAULT_PROMPT = "{context}\n\n{input}\n\nAnswer:"


def load_task(data_dir: str, task: str, limit: int) -> list[dict]:
    path = os.path.join(data_dir, f"{task}.jsonl")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"LongBench dataset not found: {path}. This environment has no "
            f"network access — place the HF LongBench jsonl export there "
            f"(or use --synthetic to exercise the harness)."
        )
    samples = []
    with open(path) as f:
        for line in f:
            if line.strip():
                samples.append(json.loads(line))
            if len(samples) >= limit:
                break
    return samples


def synthetic_task(task: str, n: int) -> list[dict]:
    """Tiny self-checking stand-ins (harness test; scores are meaningful
    only in that a copying model would score 1.0)."""
    out = []
    for i in range(n):
        ans = f"fact {i} alpha"
        ctx = " ".join(
            f"Paragraph {j}: filler text about topic {j}." for j in range(6)
        ) + f" The important detail is {ans}."
        out.append({
            "input": "What is the important detail?",
            "context": ctx,
            "answers": [ans],
            "all_classes": ["fact", "fiction"] if task == "trec" else [],
            "length": len(ctx.split()),
        })
    return out


def run_task(engine, task: str, samples: list[dict], max_ctx_tokens: int,
             art: Artifact) -> float:
    """Submit every sample up front and drain via continuous batching —
    one engine session per task (reference batched regression runners;
    VERDICT r1: the sample-serial loop was unusable at 50x128K scale)."""
    from sparsevllm_tpu import SamplingParams

    template = TASK_PROMPT.get(task, DEFAULT_PROMPT)
    prompts = []
    for sample in samples:
        prompt = template.format(
            context=sample.get("context", ""), input=sample.get("input", "")
        )
        ids = engine.tokenizer.encode(prompt)
        if len(ids) > max_ctx_tokens:
            # middle-truncate (reference keeps head+tail halves)
            half = max_ctx_tokens // 2
            ids = ids[:half] + ids[-half:]
            prompt = engine.tokenizer.decode(ids)
        prompts.append(prompt)
    outs = engine.generate(
        prompts=prompts,
        sampling_params=SamplingParams(
            temperature=0.0,
            max_tokens=TASK_MAX_GEN.get(task, 64),
        ),
    )
    total = 0.0
    for idx, (sample, out) in enumerate(zip(samples, outs)):
        pred = out.text
        sc = score_sample(task, pred, sample.get("answers", []),
                          sample.get("all_classes") or None)
        total += sc
        art.add_raw({"task": task, "idx": idx, "score": sc,
                     "prediction": pred[:200]})
    return 100.0 * total / max(len(samples), 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--data", default="")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--tasks", default="qasper,hotpotqa,multi_news,trec,"
                                       "passage_retrieval_en,lcc")
    ap.add_argument("--samples", type=int, default=50)
    ap.add_argument("--method", default="")
    ap.add_argument("--max-ctx", type=int, default=120000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--engine-kwargs", default="{}")
    args = ap.parse_args()

    from sparsevllm_tpu.engine.llm_engine import LLMEngine

    tasks = [t for t in args.tasks.split(",") if t]
    kwargs = json.loads(args.engine_kwargs)
    if args.method:
        kwargs["sparse_method"] = args.method
    art = Artifact("longbench", {
        "model": args.model, "method": args.method or "vanilla",
        "tasks": tasks, "samples": args.samples,
        "synthetic": args.synthetic,
    })
    engine = LLMEngine(model=args.model, **kwargs)
    if engine.tokenizer is None:
        raise RuntimeError(
            "LongBench needs a real tokenizer (text prompts); tiny_random "
            "engines cannot run it — use benchmark/niah.py for synthetic "
            "stress runs"
        )
    per_task = {}
    error = None
    try:
        for task in tasks:
            samples = (
                synthetic_task(task, args.samples) if args.synthetic
                else load_task(args.data, task, args.samples)
            )
            per_task[task] = run_task(engine, task, samples, args.max_ctx,
                                      art)
    except Exception as e:  # noqa: BLE001
        error = repr(e)
        raise
    finally:
        avg = (sum(per_task.values()) / len(per_task)) if per_task else 0.0
        for task, sc in per_task.items():
            art.add_parsed({"task": task, "score": round(sc, 2)})
        art.finish({"per_task": per_task, "average": round(avg, 2)},
                   error=error)
        art.save(args.out)
        print(json.dumps({"per_task": per_task, "average": round(avg, 2)}))
        engine.exit()


if __name__ == "__main__":
    main()
