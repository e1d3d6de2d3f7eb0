"""Unified video QA runner: MVBench / LongVideoBench / MLVU / Video-MME.

Reference: benchmark/multimodal/video_qa/evaluate.py + datasets.py. Rows
load from LOCAL annotation files (this environment has no egress; a
missing dataset is a LOUD error, and ``--synthetic`` builds tiny
self-checking stand-ins that exercise parsing + scoring + artifacts).

Each row: {"question", "options" (list or 'A|B|...'), "answer"
(index/letter/text), optional "subtitles"/"context" (textual evidence),
optional "video" (ignored by the text adapter)}. Prompting follows the
reference's MCQ template: evidence, question, labeled options, then
"Answer with the option's letter from the given choices directly."

    python -m benchmark.multimodal.video_qa --benchmark videomme \
        --data /data/Video-MME --adapter engine_text \
        --model /ckpt --use-subtitles --out videomme.json
"""

from __future__ import annotations

import argparse
import json
import os
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

BENCHMARKS = ("mvbench", "longvideobench", "mlvu", "videomme")
# annotation file basenames accepted per benchmark (HF export layouts)
ANNOTATION_NAMES = (
    "annotations.json", "test.json", "qa.json", "data.json",
    "annotations.jsonl", "test.jsonl",
)


def load_rows(data_dir: str, benchmark: str, limit: int) -> list[dict]:
    if not os.path.isdir(data_dir):
        raise FileNotFoundError(
            f"{benchmark} dataset directory not found: {data_dir!r}. This "
            f"environment has no network access — place the exported "
            f"annotations ({'/'.join(ANNOTATION_NAMES[:3])}) there, or use "
            f"--synthetic to exercise the harness."
        )
    for name in ANNOTATION_NAMES:
        path = os.path.join(data_dir, name)
        if not os.path.exists(path):
            continue
        rows: list[dict] = []
        with open(path) as f:
            if name.endswith(".jsonl"):
                for line in f:
                    if line.strip():
                        rows.append(json.loads(line))
            else:
                payload = json.load(f)
                if isinstance(payload, dict):
                    for key in ("data", "records", "questions",
                                "annotations"):
                        if isinstance(payload.get(key), list):
                            payload = payload[key]
                            break
                rows = [r for r in payload if isinstance(r, dict)]
        if limit:
            rows = rows[:limit]
        if not rows:
            raise ValueError(f"no rows in {path!r}")
        return rows
    raise FileNotFoundError(
        f"no annotation file under {data_dir!r} (looked for "
        f"{ANNOTATION_NAMES})"
    )


def synthetic_rows(n: int, seed: int = 0) -> list[dict]:
    """Self-checking rows: the subtitles state the answer outright, so a
    competent text model scores ~100% and the harness path is validated."""
    import numpy as np

    rng = np.random.default_rng(seed)
    colors = ["red", "green", "blue", "yellow"]
    rows = []
    for i in range(n):
        ans = int(rng.integers(0, 4))
        rows.append({
            "question": "What color is the ball?",
            "options": colors,
            "answer": ans,
            "subtitles": f"Scene {i}: a {colors[ans]} ball rolls by.",
            "video": f"synthetic_{i}.mp4",
        })
    return rows


def build_prompt(row: dict, options: list[str],
                 use_subtitles: bool) -> str:
    parts = []
    evidence = row.get("subtitles") or row.get("context") or ""
    if use_subtitles and evidence:
        parts.append(f"Subtitles:\n{evidence}\n")
    parts.append(f"Question: {row['question']}")
    parts.extend(options)
    parts.append(
        "Answer with the option's letter from the given choices directly."
    )
    return "\n".join(parts)


def run(rows: list[dict], adapter, use_subtitles: bool,
        art: Artifact) -> dict:
    correct = parse_failed = 0
    for i, row in enumerate(rows):
        options = normalize_labeled_options(row["options"])
        valid = CHOICE_LETTERS[: len(options)]
        truth = answer_to_letter(row["answer"], options)
        text = adapter.generate(prompt=build_prompt(
            row, options, use_subtitles
        ))
        choice = first_choice_letter(text, valid=valid)
        status = status_for_choice(choice)
        hit = choice == truth
        correct += hit
        parse_failed += status == "parse_failed"
        art.add_parsed({
            "idx": i, "choice": choice, "truth": truth,
            "status": status, "correct": bool(hit),
        })
    return {
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
    ap.add_argument("--method", default="",
                    help="sparse method engine kwarg (engine_text)")
    ap.add_argument("--use-subtitles", action="store_true")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="run N self-checking synthetic rows instead of a "
                         "local dataset")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    art = Artifact("multimodal_video_qa", vars(args))
    results, error = {}, None
    try:
        rows = (synthetic_rows(args.synthetic) if args.synthetic
                else load_rows(args.data, args.benchmark, args.limit))
        kwargs = {}
        if args.method:
            kwargs["sparse_method"] = args.method
        adapter = build_adapter(args.adapter, args.model, **kwargs)
        try:
            results = run(rows, adapter, args.use_subtitles, art)
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
