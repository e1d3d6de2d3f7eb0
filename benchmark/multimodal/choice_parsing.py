"""Multiple-choice parsing/scoring shared by the multimodal runners.

Contract-compatible with the reference's
benchmark/multimodal/common/choice_parsing.py and
video_qa/datasets.py:59-104 (normalize_labeled_options / answer_to_letter):
identical inputs produce identical letters, so accuracy numbers are
comparable across frameworks.
"""

from __future__ import annotations

import ast
import re
import string

CHOICE_LETTERS = "ABCDEFGH"


def first_choice_letter(text: str, *, valid: str = "ABCD") -> str:
    """First standalone capital letter in ``text`` that is a valid choice;
    '' when the generation contains none (a parse failure, not a zero)."""
    match = re.search(r"\b([A-Z])\b", str(text).upper())
    if match and match.group(1) in set(valid):
        return match.group(1)
    return ""


def status_for_choice(choice: str) -> str:
    return "success" if choice else "parse_failed"


def _as_list(value) -> list:
    if value is None:
        return []
    if isinstance(value, (list, tuple)):
        return list(value)
    if hasattr(value, "tolist"):
        out = value.tolist()
        return out if isinstance(out, list) else [out]
    if isinstance(value, str):
        stripped = value.strip()
        if not stripped:
            return []
        try:
            return _as_list(ast.literal_eval(stripped))
        except (SyntaxError, ValueError):
            return [p.strip() for p in stripped.split("|") if p.strip()]
    return [value]


def normalize_labeled_options(options) -> list[str]:
    """['cat', 'B. dog'] -> ['A. cat', 'B. dog'] (letters assigned by
    position; already-labeled entries pass through)."""
    values = [str(v).strip() for v in _as_list(options)]
    if not 1 <= len(values) <= len(CHOICE_LETTERS):
        raise ValueError(
            f"expected 1-{len(CHOICE_LETTERS)} options, got "
            f"{len(values)}: {values!r}"
        )
    labeled = []
    for idx, value in enumerate(values):
        letter = CHOICE_LETTERS[idx]
        if (value[:1].upper() == letter and len(value) > 1
                and value[1] in {".", ")", ":", " "}):
            labeled.append(value)
        else:
            labeled.append(f"{letter}. {value}")
    return labeled


def _norm_text(text: str) -> str:
    table = str.maketrans("", "", string.punctuation)
    return " ".join(str(text).lower().translate(table).split())


def answer_to_letter(answer, options: list[str]) -> str:
    """Ground-truth answer (index, letter, or option text) -> letter."""
    if answer is None:
        raise ValueError("missing answer")
    if isinstance(answer, bool):
        raise ValueError(f"boolean is not a multiple-choice answer: {answer!r}")
    if isinstance(answer, int):
        if 0 <= answer < len(options):
            return CHOICE_LETTERS[answer]
        if 1 <= answer <= len(options):
            return CHOICE_LETTERS[answer - 1]
    raw = str(answer).strip()
    if not raw:
        raise ValueError("empty answer")
    # first-character letter wins before text matching — byte-for-byte the
    # reference precedence (datasets.py:88-90), kept for score parity
    first = raw[:1].upper()
    if first in CHOICE_LETTERS[: len(options)]:
        return first
    raw_norm = _norm_text(raw)
    for idx, option in enumerate(options):
        body = option.split(".", 1)[-1].strip() if "." in option[:3] else option
        if raw_norm in (_norm_text(body), _norm_text(option)):
            return CHOICE_LETTERS[idx]
    raise ValueError(f"cannot map answer={answer!r} to options={options!r}")
