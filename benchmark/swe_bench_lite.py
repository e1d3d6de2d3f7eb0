"""SWE-bench-Lite runner: a self-contained agent loop over the OpenAI server.

Reference counterpart: benchmark/swe_bench_lite/run.py (which shells out to
mini-swe-agent + litellm against the sparse engine's server). That external
tooling does not exist in this environment, so this module implements the
same boundary natively:

  * instances load from a LOCAL JSONL (``--instances``; loud error when
    absent — no network);
  * each instance runs a bounded act-observe loop against an
    OpenAI-compatible ``/v1/chat/completions`` endpoint (this engine's
    server or any other): the model emits ONE ```bash block per turn,
    the runner executes it in the instance sandbox and feeds stdout/stderr
    back, until the model submits a ```diff block followed by SUBMIT
    (or the step cap hits);
  * predictions land in SWE-bench's evaluation format
    ({instance_id, model_name_or_path, model_patch} JSONL).

    python -m benchmark.swe_bench_lite --endpoint http://localhost:8000 \
        --instances swebench_lite.jsonl --workdir /tmp/sandboxes \
        --out predictions.jsonl
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmark.artifacts import Artifact  # noqa: E402

SYSTEM_PROMPT = """\
You are an autonomous software engineer fixing a bug in a repository.
Each turn, reply with EITHER:
  * exactly one shell command in a ```bash fenced block (it runs in the
    repository root; you see its output next turn), OR
  * your final patch in a ```diff fenced block followed by the single
    word SUBMIT on its own line.
Work step by step: inspect files, reproduce, fix, then submit."""

BASH_RE = re.compile(r"```bash\n(.*?)```", re.DOTALL)
DIFF_RE = re.compile(r"```diff\n(.*?)```", re.DOTALL)


def chat(endpoint: str, model: str, messages: list[dict],
         max_tokens: int = 1024, timeout: float = 300.0) -> str:
    req = urllib.request.Request(
        endpoint.rstrip("/") + "/v1/chat/completions",
        data=json.dumps({
            "model": model, "messages": messages,
            "temperature": 0.0, "max_tokens": max_tokens,
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        body = json.loads(resp.read())
    return body["choices"][0]["message"]["content"]


def run_instance(endpoint: str, model: str, inst: dict, sandbox: Path,
                 max_steps: int, cmd_timeout: float,
                 obs_limit: int = 4000) -> dict:
    messages = [
        {"role": "system", "content": SYSTEM_PROMPT},
        {"role": "user", "content": inst["problem_statement"]},
    ]
    for step in range(max_steps):
        try:
            reply = chat(endpoint, model, messages)
        except Exception as e:  # noqa: BLE001
            return {"status": "model_failed", "error": repr(e),
                    "steps": step}
        messages.append({"role": "assistant", "content": reply})
        diff = DIFF_RE.search(reply)
        if diff and re.search(r"^SUBMIT\s*$", reply, re.MULTILINE):
            return {"status": "success", "model_patch": diff.group(1),
                    "steps": step + 1}
        cmd = BASH_RE.search(reply)
        if not cmd:
            messages.append({
                "role": "user",
                "content": "Reply with one ```bash block or a ```diff "
                           "block + SUBMIT.",
            })
            continue
        try:
            proc = subprocess.run(
                ["bash", "-c", cmd.group(1)], cwd=sandbox,
                capture_output=True, text=True, timeout=cmd_timeout,
            )
            obs = (proc.stdout + proc.stderr)[:obs_limit]
            obs = f"exit={proc.returncode}\n{obs}"
        except subprocess.TimeoutExpired:
            obs = f"command timed out after {cmd_timeout}s"
        messages.append({"role": "user", "content": obs})
    return {"status": "parse_failed", "error": "step cap reached",
            "steps": max_steps}


def load_instances(path: Path) -> list[dict]:
    if not path.exists():
        raise FileNotFoundError(
            f"SWE-bench-Lite instances not found at {path} — this "
            f"environment has no network access; place the dataset JSONL "
            f"locally (fields: instance_id, problem_statement[, repo])"
        )
    out = []
    for line in path.read_text().splitlines():
        if line.strip():
            out.append(json.loads(line))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--endpoint", required=True)
    ap.add_argument("--model", default="sparsevllm-tpu")
    ap.add_argument("--instances", required=True)
    ap.add_argument("--workdir", required=True,
                    help="per-instance sandbox parent (pre-checked-out "
                         "repos: <workdir>/<instance_id>)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-steps", type=int, default=30)
    ap.add_argument("--cmd-timeout", type=float, default=120.0)
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args()

    instances = load_instances(Path(args.instances))
    if args.limit:
        instances = instances[: args.limit]
    art = Artifact("swe_bench_lite", {
        "endpoint": args.endpoint, "model": args.model,
        "n_instances": len(instances), "max_steps": args.max_steps,
    })
    workdir = Path(args.workdir)
    n_ok = 0
    error = None
    try:
        with open(args.out, "w") as f:
            for inst in instances:
                iid = inst["instance_id"]
                sandbox = workdir / iid
                if not sandbox.is_dir():
                    res = {"status": "invalid_input",
                           "error": f"sandbox missing: {sandbox}"}
                else:
                    res = run_instance(
                        args.endpoint, args.model, inst, sandbox,
                        args.max_steps, args.cmd_timeout,
                    )
                art.add_raw({"instance_id": iid, **{
                    k: v for k, v in res.items() if k != "model_patch"
                }})
                f.write(json.dumps({
                    "instance_id": iid,
                    "model_name_or_path": args.model,
                    "model_patch": res.get("model_patch", ""),
                }) + "\n")
                n_ok += res["status"] == "success"
                print(f"{iid}: {res['status']} ({res.get('steps', 0)} "
                      f"steps)", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        error = repr(e)
        raise
    finally:
        art.finish({"submitted": n_ok, "total": len(instances)}, error)
        art.save(args.out + ".artifact.json")


if __name__ == "__main__":
    main()
