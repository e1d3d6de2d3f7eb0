"""Claw-Eval adapter: reproducible text-only task selection + result
validation.

Reference counterpart: benchmark/claw_eval/{select_tasks,validate_results}.py
— the engine-side half of the Claw-Eval loop. The external Claw-Eval
harness runs agents against the OpenAI server; this module owns the two
boundaries the engine repo is responsible for:

  * ``select``: build a text-only task selection from a Claw-Eval tasks
    directory (multimodal categories/tags and visual attachments are
    excluded — this engine serves text models), with a marker file so a
    selection directory can never silently mix sources, plus a skipped-
    results JSONL that scoring merges back in as ``skipped_by_policy``.
  * ``validate``: audit a finished run — every selected task has exactly
    one result with a terminal status, no unknown statuses, no task
    errors — and write a summary with per-status counts.

    python -m benchmark.claw_eval select --tasks-dir T --out-root O
    python -m benchmark.claw_eval validate --selection O --results R.jsonl
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

VISUAL_FILE_SUFFIXES = {
    ".bmp", ".gif", ".jpeg", ".jpg", ".pdf", ".png", ".ppt", ".pptx",
    ".svg", ".tif", ".tiff", ".webp", ".xls", ".xlsx",
}
FINAL_STATUSES = {
    "success", "invalid_input", "model_failed", "parse_failed",
    "metric_failed", "skipped_by_policy",
}
MARKER = ".claw_text_only_selection"


class ClawEvalError(RuntimeError):
    pass


def _load_task(path: Path) -> dict:
    import yaml

    data = yaml.safe_load(path.read_text(encoding="utf-8")) or {}
    if not isinstance(data, dict):
        raise ClawEvalError(f"task file is not a mapping: {path}")
    return data


def _task_files(task: dict) -> list[str]:
    prompt = task.get("prompt")
    attachments = (
        prompt.get("attachments", []) if isinstance(prompt, dict) else []
    )
    sandbox = task.get("sandbox_files", []) or []
    return sorted({str(v) for v in list(attachments or []) + list(sandbox)})


def skip_reasons(task: dict) -> list[str]:
    """Why a task is excluded from a text-only run (empty = keep)."""
    reasons = []
    if task.get("category") == "multimodal":
        reasons.append("category=multimodal")
    if "multimodal" in (task.get("tags") or []):
        reasons.append("tag=multimodal")
    visual = [
        f for f in _task_files(task)
        if Path(f).suffix.lower() in VISUAL_FILE_SUFFIXES
    ]
    if visual:
        reasons.append("visual_files=" + ",".join(visual))
    return reasons


def select_text_only(tasks_dir: Path, out_root: Path, tag: str | None,
                     summary_path: Path, skipped_path: Path) -> dict:
    if not tasks_dir.is_dir():
        raise ClawEvalError(f"tasks directory does not exist: {tasks_dir}")
    out_root.mkdir(parents=True, exist_ok=True)
    marker = out_root / MARKER
    expected = str(tasks_dir.resolve())
    existing = [p for p in out_root.iterdir() if p.name != MARKER]
    if existing and not marker.exists():
        raise ClawEvalError(
            f"refusing to reuse a non-selection directory: {out_root}"
        )
    if marker.exists() and marker.read_text().strip() != expected:
        raise ClawEvalError(
            f"selection directory belongs to another tasks dir: {out_root}"
        )
    marker.write_text(expected + "\n")

    sel_dir = out_root / tasks_dir.name
    sel_dir.mkdir(exist_ok=True)
    selected, skipped = [], []
    seen: set[str] = set()
    for task_yaml in sorted(tasks_dir.glob("*/task.yaml")):
        task = _load_task(task_yaml)
        task_id = str(task.get("id") or task_yaml.parent.name)
        if task_id in seen:
            raise ClawEvalError(f"duplicate task id {task_id!r}")
        seen.add(task_id)
        if tag and tag not in (task.get("tags") or []):
            continue
        reasons = skip_reasons(task)
        if reasons:
            skipped.append({
                "task_id": task_id,
                "status": "skipped_by_policy",
                "reasons": reasons,
            })
            continue
        target = sel_dir / task_yaml.parent.name
        if not target.exists():
            target.symlink_to(task_yaml.parent.resolve(),
                              target_is_directory=True)
        selected.append(task_id)

    summary = {
        "tasks_dir": expected,
        "selected": sorted(selected),
        "skipped": sorted(s["task_id"] for s in skipped),
        "tag": tag,
    }
    summary_path.parent.mkdir(parents=True, exist_ok=True)
    summary_path.write_text(json.dumps(summary, indent=2, sort_keys=True)
                            + "\n")
    with skipped_path.open("w") as f:
        for row in skipped:
            f.write(json.dumps(row, sort_keys=True) + "\n")
    return summary


def validate_results(summary_path: Path, results_path: Path,
                     out_path: Path | None = None) -> dict:
    try:
        summary = json.loads(summary_path.read_text())
    except FileNotFoundError as e:
        raise ClawEvalError(f"selection summary missing: {summary_path}") \
            from e
    expected = set(summary["selected"]) | set(summary.get("skipped", []))
    try:
        lines = results_path.read_text().splitlines()
    except FileNotFoundError as e:
        raise ClawEvalError(f"results artifact missing: {results_path}") \
            from e
    counts: dict[str, int] = {}
    seen: set[str] = set()
    for i, line in enumerate(lines, 1):
        if not line.strip():
            continue
        try:
            row = json.loads(line)
        except json.JSONDecodeError as e:
            raise ClawEvalError(f"invalid JSON on results line {i}") from e
        tid = row.get("task_id")
        status = row.get("status")
        if not tid or not isinstance(tid, str):
            raise ClawEvalError(f"results line {i}: missing task_id")
        if status not in FINAL_STATUSES:
            raise ClawEvalError(
                f"results line {i}: non-terminal status {status!r} "
                f"(expected one of {sorted(FINAL_STATUSES)})"
            )
        if tid in seen:
            raise ClawEvalError(f"duplicate result for task {tid!r}")
        if tid not in expected:
            raise ClawEvalError(f"result for unselected task {tid!r}")
        seen.add(tid)
        counts[status] = counts.get(status, 0) + 1
    missing = sorted(expected - seen)
    if missing:
        raise ClawEvalError(f"missing results for tasks: {missing}")
    report = {
        "total": len(seen),
        "by_status": dict(sorted(counts.items())),
        "success_rate": counts.get("success", 0) / max(len(seen), 1),
    }
    if out_path is not None:
        out_path.write_text(json.dumps(report, indent=2, sort_keys=True)
                            + "\n")
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("select")
    s.add_argument("--tasks-dir", required=True)
    s.add_argument("--out-root", required=True)
    s.add_argument("--tag", default=None)
    v = sub.add_parser("validate")
    v.add_argument("--selection-summary", required=True)
    v.add_argument("--results", required=True)
    v.add_argument("--out", default="")
    args = ap.parse_args()
    if args.cmd == "select":
        out_root = Path(args.out_root)
        summary = select_text_only(
            Path(args.tasks_dir), out_root, args.tag,
            out_root / "selection_summary.json",
            out_root / "skipped_results.jsonl",
        )
        print(json.dumps({"selected": len(summary["selected"]),
                          "skipped": len(summary["skipped"])}))
    else:
        report = validate_results(
            Path(args.selection_summary), Path(args.results),
            Path(args.out) if args.out else None,
        )
        print(json.dumps(report))


if __name__ == "__main__":
    main()
