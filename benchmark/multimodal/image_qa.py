"""Image QA runner: ScienceQA-IMG / POPE / MMBench_EN / MME / MMMU.

Reference: benchmark/multimodal/image_qa/small_image_bench.py. Two scoring
families, matching the reference's task table (:36-75):

* MCQ (scienceqa_img, mmbench_en, mmmu): labeled options, first-letter
  parsing — same contract as the video runner.
* yes/no (pope, mme): first \\b(yes|no)\\b match, case-insensitive
  (YES_NO_RE, :75); a generation with neither is a parse failure.

Rows load from LOCAL jsonl exports ({benchmark}.jsonl: {"question",
"options"?, "answer", "context"?}); images are ignored by the text
adapter (vision adapters are gated — see adapters.py). Missing dataset =
loud error; --synthetic builds self-checking rows.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])

from benchmark.artifacts import Artifact  # noqa: E402
from benchmark.multimodal.adapters import build_adapter  # noqa: E402
from benchmark.multimodal.choice_parsing import (  # noqa: E402
    CHOICE_LETTERS,
    answer_to_letter,
    first_choice_letter,
    normalize_labeled_options,
    status_for_choice,
)

YES_NO_RE = re.compile(r"\b(yes|no)\b", re.IGNORECASE)
MCQ_BENCHMARKS = ("scienceqa_img", "mmbench_en", "mmmu")
YESNO_BENCHMARKS = ("pope", "mme")
BENCHMARKS = MCQ_BENCHMARKS + YESNO_BENCHMARKS


def first_yes_no(text: str) -> str:
    m = YES_NO_RE.search(str(text))
    return m.group(1).lower() if m else ""


def load_rows(data_dir: str, benchmark: str, limit: int) -> list[dict]:
    path = os.path.join(data_dir, f"{benchmark}.jsonl")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{benchmark} rows not found at {path!r}. No network access — "
            f"export the dataset there, or use --synthetic."
        )
    rows = []
    with open(path) as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))
    if limit:
        rows = rows[:limit]
    if not rows:
        raise ValueError(f"no rows in {path!r}")
    return rows


def synthetic_rows(benchmark: str, n: int, seed: int = 0) -> list[dict]:
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    if benchmark in YESNO_BENCHMARKS:
        for i in range(n):
            ans = "yes" if rng.integers(0, 2) else "no"
            obj = "a dog" if ans == "yes" else "no dog"
            rows.append({
                "question": "Is there a dog in the image?",
                "answer": ans,
                "context": f"The image shows {obj} in a park.",
                # random pixels so vision adapters exercise the tower +
                # splice path; text adapters ignore this field
                "image": rng.random((32, 32, 3), np.float32),
            })
    else:
        shapes = ["circle", "square", "triangle", "star"]
        for i in range(n):
            ans = int(rng.integers(0, 4))
            rows.append({
                "question": "Which shape is shown?",
                "options": shapes,
                "answer": ans,
                "context": f"A large {shapes[ans]} fills the frame.",
            })
    return rows


def run(rows: list[dict], benchmark: str, adapter, art: Artifact) -> dict:
    yes_no = benchmark in YESNO_BENCHMARKS
    correct = parse_failed = 0
    for i, row in enumerate(rows):
        parts = []
        if row.get("context"):
            parts.append(f"Description: {row['context']}")
        parts.append(f"Question: {row['question']}")
        kw = {}
        if row.get("image") is not None and getattr(
            adapter, "accepts_images", False
        ):
            kw["image"] = row["image"]
        if yes_no:
            truth = str(row["answer"]).strip().lower()
            parts.append("Answer yes or no directly.")
            text = adapter.generate(prompt="\n".join(parts), **kw)
            choice = first_yes_no(text)
        else:
            options = normalize_labeled_options(row["options"])
            truth = answer_to_letter(row["answer"], options)
            parts.extend(options)
            parts.append(
                "Answer with the option's letter from the given choices "
                "directly."
            )
            text = adapter.generate(prompt="\n".join(parts), **kw)
            choice = first_choice_letter(
                text, valid=CHOICE_LETTERS[: len(options)]
            )
        status = status_for_choice(choice)
        hit = choice == truth
        correct += hit
        parse_failed += status == "parse_failed"
        art.add_parsed({
            "idx": i, "choice": choice, "truth": truth,
            "status": status, "correct": bool(hit),
        })
    return {
        "metric": "yes_no_accuracy" if yes_no else "accuracy",
        "accuracy": correct / len(rows),
        "parse_failed": parse_failed,
        "n": len(rows),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--benchmark", required=True, choices=BENCHMARKS)
    ap.add_argument("--data", default="")
    ap.add_argument("--adapter", default="engine_text")
    ap.add_argument("--model", default="tiny-random")
    ap.add_argument("--method", default="")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    art = Artifact("multimodal_image_qa", vars(args))
    results, error = {}, None
    try:
        rows = (synthetic_rows(args.benchmark, args.synthetic)
                if args.synthetic
                else load_rows(args.data, args.benchmark, args.limit))
        kwargs = {}
        if args.method:
            kwargs["sparse_method"] = args.method
        adapter = build_adapter(args.adapter, args.model, **kwargs)
        try:
            results = run(rows, args.benchmark, adapter, art)
        finally:
            if hasattr(adapter, "close"):
                adapter.close()
    except Exception as e:  # noqa: BLE001
        error = repr(e)
        raise
    finally:
        art.finish(results, error)
        art.save(args.out)
    print(json.dumps({"benchmark": args.benchmark, **results}))


if __name__ == "__main__":
    main()
