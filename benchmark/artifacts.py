"""Benchmark artifact schema.

Re-expresses reference benchmark/microbench.py:114-269 artifact discipline:
every run emits a JSON artifact with RAW measurements, PARSED metrics, a
STATUS block, and an AGGREGATE section kept separate (tested by reference
tests/test_microbench_artifacts.py), stamped with git metadata and an
environment snapshot so results are attributable.
"""

from __future__ import annotations

import json
import os
import platform
import subprocess
import time


def git_metadata(repo_root: str | None = None) -> dict:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(*args):
        try:
            return subprocess.check_output(
                ["git", "-C", root, *args], text=True,
                stderr=subprocess.DEVNULL,
            ).strip()
        except Exception:  # noqa: BLE001 — not a git checkout
            return None

    return {
        "commit": run("rev-parse", "HEAD"),
        "branch": run("rev-parse", "--abbrev-ref", "HEAD"),
        "dirty": bool(run("status", "--porcelain")),
    }


def env_snapshot() -> dict:
    import jax

    snap = {
        "platform": platform.platform(),
        "python": platform.python_version(),
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
    }
    snap["env"] = {
        k: v for k, v in os.environ.items()
        if k.startswith(("JAX_", "XLA_", "LIBTPU"))
    }
    return snap


class Artifact:
    """raw / parsed / status / aggregate separation."""

    def __init__(self, kind: str, config: dict):
        self.data = {
            "kind": kind,
            "created_at": time.time(),
            "config": config,
            "git": git_metadata(),
            "environment": env_snapshot(),
            "raw": [],
            "parsed": [],
            "status": {"state": "running", "error": None},
            "aggregate": {},
        }

    def add_raw(self, record: dict) -> None:
        self.data["raw"].append(record)

    def add_parsed(self, record: dict) -> None:
        self.data["parsed"].append(record)

    def finish(self, aggregate: dict, error: str | None = None) -> None:
        self.data["aggregate"] = aggregate
        self.data["status"] = {
            "state": "failed" if error else "ok",
            "error": error,
        }

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.data, f, indent=2, default=str)
