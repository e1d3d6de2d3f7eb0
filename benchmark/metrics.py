"""Scoring metrics for the quality benchmarks (LongBench/SCBench families).

Pure-python re-expressions of the reference benchmark metrics
(benchmark/ LongBench scoring: qa_f1_score, rouge_score, classification
accuracy, retrieval accuracy, code_sim) — no external deps (the reference
uses rouge/fuzzywuzzy wheels; rouge-L and token-F1 are small enough to
implement directly, and identical formulas keep scores comparable).
"""

from __future__ import annotations

import re
import string
from collections import Counter


def normalize_answer(s: str) -> str:
    """Lower, strip punctuation/articles/extra whitespace (SQuAD-style)."""
    s = s.lower()
    s = "".join(ch for ch in s if ch not in set(string.punctuation))
    s = re.sub(r"\b(a|an|the)\b", " ", s)
    return " ".join(s.split())


def qa_f1_score(prediction: str, ground_truth: str) -> float:
    """Token-level F1 after normalization (LongBench qa_f1_score)."""
    pred = normalize_answer(prediction).split()
    gold = normalize_answer(ground_truth).split()
    common = Counter(pred) & Counter(gold)
    num_same = sum(common.values())
    if num_same == 0:
        return 0.0
    precision = num_same / len(pred)
    recall = num_same / len(gold)
    return 2 * precision * recall / (precision + recall)


def _lcs_len(a: list[str], b: list[str]) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if x == y else max(prev[j], cur[-1]))
        prev = cur
    return prev[-1]


def rouge_l_score(prediction: str, ground_truth: str) -> float:
    """ROUGE-L F-measure over whitespace tokens (summarization tasks)."""
    pred = normalize_answer(prediction).split()
    gold = normalize_answer(ground_truth).split()
    lcs = _lcs_len(pred, gold)
    if lcs == 0:
        return 0.0
    p = lcs / len(pred)
    r = lcs / len(gold)
    return 2 * p * r / (p + r)


def classification_score(prediction: str, ground_truth: str,
                         all_classes: list[str] | None = None) -> float:
    """LongBench classification — formula identical to the reference
    (long_bench/metrics.py classification_score) including its
    case-sensitive membership and iterate-while-removing loop."""
    em_match_list = []
    for class_name in all_classes or []:
        if class_name in prediction:
            em_match_list.append(class_name)
    for match_term in em_match_list:
        if match_term in ground_truth and match_term != ground_truth:
            em_match_list.remove(match_term)
    if ground_truth in em_match_list:
        return 1.0 / len(em_match_list)
    return 0.0


def retrieval_score(prediction: str, ground_truth: str) -> float:
    """Passage retrieval — reference ratio semantics
    (long_bench/metrics.py retrieval_score): the share of numbers in the
    prediction equal to the gold paragraph id."""
    matches = re.findall(r"Paragraph (\d+)", ground_truth)
    if not matches:
        return float(normalize_answer(ground_truth)
                     in normalize_answer(prediction))
    gold = matches[0]
    numbers = re.findall(r"\d+", prediction)
    if not numbers:
        return 0.0
    right = sum(1 for n in numbers if str(n) == str(gold))
    return right / len(numbers)


def count_score(prediction: str, ground_truth: str) -> float:
    """passage_count — reference ratio semantics (count_score)."""
    numbers = re.findall(r"\d+", prediction)
    if not numbers:
        return 0.0
    right = sum(1 for n in numbers if str(n) == str(ground_truth))
    return right / len(numbers)


def _indel_ratio(a: str, b: str) -> float:
    """Levenshtein 'indel' similarity = (len(a)+len(b) - dist)/(len(a)+
    len(b)) with substitutions costing 2 — python-Levenshtein.ratio, the
    backend of fuzzywuzzy's fuzz.ratio."""
    la, lb = len(a), len(b)
    if la + lb == 0:
        return 1.0
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i]
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 2
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + cost))
        prev = cur
    return (la + lb - prev[lb]) / (la + lb)


def code_sim_score(prediction: str, ground_truth: str) -> float:
    """Code completion (lcc/repobench) — reference semantics
    (long_bench/metrics.py code_sim_score): first line containing none of
    backtick/#//, scored with fuzz.ratio (int-percent rounding)."""
    all_lines = prediction.lstrip("\n").split("\n")
    pred = ""
    for line in all_lines:
        if ("`" not in line) and ("#" not in line) and ("//" not in line):
            pred = line
            break
    return int(round(100 * _indel_ratio(pred, ground_truth))) / 100


def exact_match_score(prediction: str, ground_truth: str) -> float:
    return float(normalize_answer(prediction) == normalize_answer(ground_truth))


DATASET2METRIC = {
    # LongBench task -> metric (reference benchmark/ dataset2metric map)
    "narrativeqa": qa_f1_score,
    "qasper": qa_f1_score,
    "multifieldqa_en": qa_f1_score,
    "hotpotqa": qa_f1_score,
    "2wikimqa": qa_f1_score,
    "musique": qa_f1_score,
    "gov_report": rouge_l_score,
    "qmsum": rouge_l_score,
    "multi_news": rouge_l_score,
    "trec": classification_score,
    "triviaqa": qa_f1_score,
    "samsum": rouge_l_score,
    "passage_retrieval_en": retrieval_score,
    "passage_count": count_score,
    "lcc": code_sim_score,
    "repobench-p": code_sim_score,
}


def score_sample(dataset: str, prediction: str, answers: list[str],
                 all_classes: list[str] | None = None) -> float:
    metric = DATASET2METRIC.get(dataset, qa_f1_score)
    best = 0.0
    for ans in answers:
        if metric is classification_score:
            best = max(best, metric(prediction, ans, all_classes))
        else:
            best = max(best, metric(prediction, ans))
    return best
