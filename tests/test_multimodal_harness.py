"""Multimodal harness: choice parsing parity + runner plumbing.

Parsing cases mirror the reference implementations byte-for-byte
(benchmark/multimodal/common/choice_parsing.py, video_qa/datasets.py
normalize_labeled_options/answer_to_letter) so accuracy numbers stay
comparable across frameworks.
"""

import json

import pytest

from benchmark.multimodal import image_qa, video_qa
from benchmark.multimodal.adapters import AdapterError, build_adapter
from benchmark.multimodal.choice_parsing import (
    answer_to_letter,
    first_choice_letter,
    normalize_labeled_options,
)


# ------------------------------------------------------------- parsing

def test_first_choice_letter():
    assert first_choice_letter("The answer is B.") == "B"
    assert first_choice_letter("(C) because ...") == "C"
    assert first_choice_letter("b") == "B"
    assert first_choice_letter("Z is my pick") == ""  # not in valid set
    assert first_choice_letter("no letter here") == ""
    assert first_choice_letter("E", valid="ABCDE") == "E"


def test_normalize_labeled_options():
    assert normalize_labeled_options(["cat", "dog"]) == ["A. cat", "B. dog"]
    assert normalize_labeled_options(["A. cat", "B) dog"]) == [
        "A. cat", "B) dog"
    ]
    # pipe-separated string form (HF csv exports)
    assert normalize_labeled_options("cat|dog") == ["A. cat", "B. dog"]
    # python-literal string form
    assert normalize_labeled_options("['cat', 'dog']") == [
        "A. cat", "B. dog"
    ]
    with pytest.raises(ValueError):
        normalize_labeled_options([])


def test_answer_to_letter():
    opts = normalize_labeled_options(["cat", "dog", "fish"])
    assert answer_to_letter(0, opts) == "A"
    assert answer_to_letter(1, opts) == "B"
    assert answer_to_letter("B", opts) == "B"
    assert answer_to_letter("b.", opts) == "B"
    assert answer_to_letter("dog", opts) == "B"  # option-text match
    assert answer_to_letter("Fish", opts) == "C"
    with pytest.raises(ValueError):
        answer_to_letter(True, opts)
    with pytest.raises(ValueError):
        answer_to_letter("zebra", opts)


def test_yes_no_parsing():
    assert image_qa.first_yes_no("Yes, there is.") == "yes"
    assert image_qa.first_yes_no("I think NO") == "no"
    assert image_qa.first_yes_no("nothing to see") == ""  # \\b guards


# ------------------------------------------------------------- runners

class OracleAdapter:
    """Answers from the row evidence — validates scoring wiring without a
    model (the harness contract, not model quality)."""

    def __init__(self, answers):
        self.answers = list(answers)
        self.i = 0

    def generate(self, prompt=None, prompt_token_ids=None):
        out = self.answers[self.i % len(self.answers)]
        self.i += 1
        return out


def test_video_qa_scoring(tmp_path):
    from benchmark.artifacts import Artifact

    rows = video_qa.synthetic_rows(4, seed=0)
    opts = [normalize_labeled_options(r["options"]) for r in rows]
    truth = [answer_to_letter(r["answer"], o) for r, o in zip(rows, opts)]
    # 3 right, 1 wrong, plus a parse failure on the wrong one
    answers = [f"Answer: {t}" for t in truth[:3]] + ["hmm unclear"]
    art = Artifact("t", {})
    res = video_qa.run(rows, OracleAdapter(answers), True, art)
    assert res == {"accuracy": 0.75, "parse_failed": 1, "n": 4}


def test_image_qa_yes_no_scoring():
    from benchmark.artifacts import Artifact

    rows = image_qa.synthetic_rows("pope", 4, seed=1)
    answers = [r["answer"] for r in rows[:3]] + ["maybe"]
    art = Artifact("t", {})
    res = image_qa.run(rows, "pope", OracleAdapter(answers), art)
    assert res["accuracy"] == 0.75 and res["parse_failed"] == 1
    assert res["metric"] == "yes_no_accuracy"


def test_missing_dataset_is_loud(tmp_path):
    with pytest.raises(FileNotFoundError, match="no network access|not found"):
        video_qa.load_rows(str(tmp_path / "nope"), "videomme", 0)
    with pytest.raises(FileNotFoundError, match="No network access"):
        image_qa.load_rows(str(tmp_path), "pope", 0)


def test_vision_adapters_gate_loudly():
    with pytest.raises(AdapterError, match="vision"):
        build_adapter("llava_onevision", "x")
    with pytest.raises(AdapterError, match="unknown adapter"):
        build_adapter("nonexistent", "x")


def test_local_annotation_loading(tmp_path):
    d = tmp_path / "mvbench"
    d.mkdir()
    rows = [{"question": "q", "options": ["a", "b"], "answer": 0}] * 3
    (d / "annotations.json").write_text(json.dumps({"data": rows}))
    got = video_qa.load_rows(str(d), "mvbench", limit=2)
    assert len(got) == 2 and got[0]["question"] == "q"
