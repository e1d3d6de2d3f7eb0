"""Claw-Eval + SWE-bench-Lite harness machinery (stub-driven).

Mirrors the reference harness self-tests (test_claw_eval_*.py,
test_swe_bench_lite_runner.py): selection/validation logic with synthetic
task dirs; the agent loop against a scripted chat endpoint."""

import json
import threading
from pathlib import Path

import pytest

from benchmark import claw_eval


def _mk_task(root: Path, tid: str, **fields):
    d = root / tid
    d.mkdir(parents=True)
    import yaml

    (d / "task.yaml").write_text(yaml.safe_dump({"id": tid, **fields}))


def test_claw_select_excludes_visual(tmp_path):
    tasks = tmp_path / "tasks"
    _mk_task(tasks, "t1", category="coding")
    _mk_task(tasks, "t2", category="multimodal")
    _mk_task(tasks, "t3", tags=["multimodal"])
    _mk_task(tasks, "t4", prompt={"attachments": ["chart.png"]})
    _mk_task(tasks, "t5", sandbox_files=["data.csv"])
    out = tmp_path / "sel"
    summary = claw_eval.select_text_only(
        tasks, out, None, out / "selection_summary.json",
        out / "skipped_results.jsonl",
    )
    assert summary["selected"] == ["t1", "t5"]
    assert summary["skipped"] == ["t2", "t3", "t4"]
    skipped = [
        json.loads(x)
        for x in (out / "skipped_results.jsonl").read_text().splitlines()
    ]
    assert all(s["status"] == "skipped_by_policy" for s in skipped)
    # marker protects against mixing sources
    other = tmp_path / "tasks2"
    _mk_task(other, "x1")
    with pytest.raises(claw_eval.ClawEvalError, match="another tasks dir"):
        claw_eval.select_text_only(
            other, out, None, out / "s.json", out / "sk.jsonl",
        )


def test_claw_validate_results(tmp_path):
    summary = tmp_path / "summary.json"
    summary.write_text(json.dumps(
        {"selected": ["a", "b"], "skipped": ["c"]}
    ))
    results = tmp_path / "results.jsonl"
    rows = [
        {"task_id": "a", "status": "success"},
        {"task_id": "b", "status": "model_failed"},
        {"task_id": "c", "status": "skipped_by_policy"},
    ]
    results.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    report = claw_eval.validate_results(summary, results)
    assert report["total"] == 3
    assert report["by_status"]["success"] == 1
    assert abs(report["success_rate"] - 1 / 3) < 1e-9
    # missing result is loud
    results.write_text(json.dumps(rows[0]) + "\n")
    with pytest.raises(claw_eval.ClawEvalError, match="missing results"):
        claw_eval.validate_results(summary, results)
    # non-terminal status is loud
    results.write_text("\n".join(
        json.dumps(r) for r in rows[:2]
        + [{"task_id": "c", "status": "running"}]
    ))
    with pytest.raises(claw_eval.ClawEvalError, match="non-terminal"):
        claw_eval.validate_results(summary, results)


class _ScriptedChat:
    """Minimal HTTP chat endpoint replaying a scripted conversation."""

    def __init__(self, replies):
        import http.server

        self.replies = list(replies)
        self.seen = []
        outer = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers["Content-Length"])
                body = json.loads(self.rfile.read(n))
                outer.seen.append(body)
                reply = outer.replies.pop(0)
                out = json.dumps({
                    "choices": [{"message": {"role": "assistant",
                                             "content": reply}}]
                }).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)

            def log_message(self, *a):
                pass

        self.httpd = http.server.HTTPServer(("127.0.0.1", 0), H)
        self.thread = threading.Thread(target=self.httpd.serve_forever,
                                       daemon=True)
        self.thread.start()

    @property
    def endpoint(self):
        return f"http://127.0.0.1:{self.httpd.server_port}"

    def stop(self):
        self.httpd.shutdown()


def test_swe_bench_agent_loop(tmp_path):
    from benchmark.swe_bench_lite import run_instance

    sandbox = tmp_path / "inst1"
    sandbox.mkdir()
    (sandbox / "bug.py").write_text("x = 1\n")
    patch = "--- a/bug.py\n+++ b/bug.py\n@@\n-x = 1\n+x = 2\n"
    srv = _ScriptedChat([
        "Let me look around.\n```bash\nls && cat bug.py\n```",
        f"Found it.\n```diff\n{patch}```\nSUBMIT",
    ])
    try:
        res = run_instance(
            srv.endpoint, "m", {"problem_statement": "x should be 2"},
            sandbox, max_steps=5, cmd_timeout=10,
        )
    finally:
        srv.stop()
    assert res["status"] == "success"
    assert res["model_patch"] == patch
    assert res["steps"] == 2
    # the command really ran in the sandbox and its output went back
    obs = srv.seen[1]["messages"][-1]["content"]
    assert "bug.py" in obs and "x = 1" in obs and obs.startswith("exit=0")


def test_swe_bench_instances_loud_when_missing(tmp_path):
    from benchmark.swe_bench_lite import load_instances

    with pytest.raises(FileNotFoundError, match="no network access"):
        load_instances(tmp_path / "nope.jsonl")
