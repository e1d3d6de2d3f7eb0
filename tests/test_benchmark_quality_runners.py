"""LongBench/SCBench runner machinery: metrics + synthetic harness runs.

Mirrors the reference's benchmark-harness self-tests
(test_longbench_deltakv_contracts.py, test_scbench_batched_runner.py
pattern): metric math is pinned with hand cases; the runner modules are
driven end-to-end with synthetic datasets and a stub engine (no real
checkpoints in this environment).
"""

import json
import sys
import types

import pytest

sys.path.insert(0, ".")

from benchmark import metrics  # noqa: E402


def test_qa_f1():
    assert metrics.qa_f1_score("the answer is Paris", "Paris") > 0
    assert metrics.qa_f1_score("Paris", "Paris") == 1.0
    assert metrics.qa_f1_score("", "Paris") == 0.0
    assert metrics.qa_f1_score("London", "Paris") == 0.0


def test_rouge_l():
    assert metrics.rouge_l_score("a b c d", "a b c d") == 1.0
    assert metrics.rouge_l_score("a x c y", "a b c d") > 0
    assert metrics.rouge_l_score("zzz", "a b c d") == 0.0


def test_classification():
    classes = ["LOC", "NUM", "HUM"]
    assert metrics.classification_score("LOC", "LOC", classes) == 1.0
    assert metrics.classification_score("NUM or LOC", "LOC", classes) == 0.5
    assert metrics.classification_score("HUM", "LOC", classes) == 0.0


def test_retrieval_and_code():
    assert metrics.retrieval_score("Paragraph 7", "7") == 1.0
    assert metrics.retrieval_score("Paragraph 8", "7") == 0.0
    assert metrics.code_sim_score("return x + 1", "return x + 1") == 1.0
    assert metrics.code_sim_score("# comment\nreturn x+1", "return x+1") > 0.8


def test_score_sample_dispatch():
    assert metrics.score_sample("trec", "LOC", ["LOC"], ["LOC", "NUM"]) == 1.0
    assert metrics.score_sample("qasper", "paris", ["Paris"]) == 1.0


class _EchoTok:
    """Tokenizer stub: 1 token per word; decode joins."""

    def encode(self, text):
        return list(range(len(text.split())))

    def decode(self, ids):
        return " ".join("w" for _ in ids)


class _StubEngine:
    """Engine stub answering every prompt with a canned string."""

    def __init__(self, reply):
        self.tokenizer = _EchoTok()
        self.reply = reply
        self.prompts = []

    def generate(self, prompts=None, sampling_params=None, **kw):
        # batched: ALL task samples arrive in one call (continuous
        # batching); one output per prompt
        self.prompts.extend(prompts)
        self.batch_sizes = getattr(self, "batch_sizes", [])
        self.batch_sizes.append(len(prompts))
        return [
            types.SimpleNamespace(text=self.reply, output_token_ids=[1, 2])
            for _ in prompts
        ]

    def prefix_cache_stats(self):
        return {"hit_tokens": 0}

    def exit(self):
        pass


def test_longbench_runner_synthetic(tmp_path, monkeypatch):
    from benchmark import longbench

    eng = _StubEngine("fact 0 alpha")
    out = tmp_path / "lb.json"
    monkeypatch.setattr(
        "sparsevllm_tpu.engine.llm_engine.LLMEngine",
        lambda **kw: eng,
    )
    argv = ["longbench", "--model", "stub", "--synthetic",
            "--tasks", "qasper", "--samples", "2", "--out", str(out)]
    monkeypatch.setattr(sys, "argv", argv)
    longbench.main()
    art = json.loads(out.read_text())
    assert art["status"]["state"] == "ok"
    assert "qasper" in art["aggregate"]["per_task"]
    # prediction "fact 0 alpha" matches sample 0 exactly, partial on 1
    assert art["aggregate"]["per_task"]["qasper"] > 0
    assert len(art["raw"]) == 2
    # batched submission: both samples went through ONE generate call
    assert eng.batch_sizes == [2]


def test_longbench_missing_dataset_is_loud(tmp_path, monkeypatch):
    from benchmark import longbench

    monkeypatch.setattr(
        "sparsevllm_tpu.engine.llm_engine.LLMEngine",
        lambda **kw: _StubEngine("x"),
    )
    out = tmp_path / "lb.json"
    argv = ["longbench", "--model", "stub", "--data", str(tmp_path),
            "--tasks", "qasper", "--out", str(out)]
    monkeypatch.setattr(sys, "argv", argv)
    with pytest.raises(FileNotFoundError, match="no network access"):
        longbench.main()
    art = json.loads(out.read_text())
    assert art["status"]["state"] == "failed"


def test_scbench_runner_synthetic(tmp_path, monkeypatch):
    from benchmark import scbench

    eng = _StubEngine("value-0-0")
    out = tmp_path / "sc.json"
    monkeypatch.setattr(
        "sparsevllm_tpu.engine.llm_engine.LLMEngine",
        lambda **kw: eng,
    )
    argv = ["scbench", "--model", "stub", "--synthetic",
            "--samples", "1", "--turns", "2", "--out", str(out)]
    monkeypatch.setattr(sys, "argv", argv)
    scbench.main()
    art = json.loads(out.read_text())
    assert art["status"]["state"] == "ok"
    assert len(art["raw"]) == 2  # 1 sample x 2 turns
    assert "prefix_reuse_ratio" in art["aggregate"]


def test_metric_formulas_match_reference():
    """Pinned outputs of the reference LongBench formulas
    (/root/reference/benchmark/long_bench/metrics.py) — ratio-based
    retrieval/count, case-sensitive classification, fuzz.ratio code_sim."""
    from benchmark.metrics import (
        classification_score, code_sim_score, count_score, retrieval_score,
    )

    assert retrieval_score(
        "the answer is in paragraph 5 and also 3", "Paragraph 5"
    ) == 0.5
    assert retrieval_score("no numbers here", "Paragraph 7") == 0.0
    assert abs(count_score("there are 3 or maybe 3 of them, not 4", "3")
               - 2 / 3) < 1e-9
    assert count_score("none", "2") == 0.0
    # case-sensitive membership + iterate-while-removing semantics
    assert classification_score("AB", "AB", ["A", "AB"]) == 1.0
    assert classification_score("contains A only", "AB", ["A", "AB"]) == 0.0
    # fuzz.ratio (indel distance, int-percent rounding)
    assert code_sim_score(
        "\n# comment\nreturn foo(x)\n", "return foo(y)"
    ) == 0.92
    assert code_sim_score("`code`\nx = 1", "x = 1") == 1.0
