"""Evaluation metrics (test-only, SURVEY.md §2.4 A7).

GLEU ("google_bleu") — the corpus metric the reference evaluates
recognition with (``ocr_model/utils/metrics.py:10-23``): for n-grams of
order 1..max_n, score = min(precision, recall) of matching n-gram counts.
Pure Python; used by the test suite to score extraction quality, mirroring
the reference's eval-as-test strategy.
"""

from __future__ import annotations

from collections import Counter

__all__ = ["ngrams", "google_bleu", "corpus_gleu"]


def ngrams(tokens: list[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def google_bleu(pred: list[str], ref: list[str], max_n: int = 4) -> float:
    """Sentence-level GLEU in [0, 1]."""
    if not pred or not ref:
        return 1.0 if pred == ref else 0.0
    match = 0
    n_pred = 0
    n_ref = 0
    for n in range(1, max_n + 1):
        pg, rg = ngrams(pred, n), ngrams(ref, n)
        match += sum((pg & rg).values())
        n_pred += max(0, len(pred) - n + 1)
        n_ref += max(0, len(ref) - n + 1)
    if n_pred == 0 or n_ref == 0:
        return 1.0 if pred == ref else 0.0
    return min(match / n_pred, match / n_ref)


def corpus_gleu(pairs: list[tuple[list[str], list[str]]], max_n: int = 4) -> float:
    """Corpus-level GLEU: aggregate counts over all pairs, then min(P, R)."""
    match = n_pred = n_ref = 0
    for pred, ref in pairs:
        for n in range(1, max_n + 1):
            pg, rg = ngrams(pred, n), ngrams(ref, n)
            match += sum((pg & rg).values())
            n_pred += max(0, len(pred) - n + 1)
            n_ref += max(0, len(ref) - n + 1)
    if n_pred == 0 or n_ref == 0:
        return 1.0 if n_pred == n_ref else 0.0
    return min(match / n_pred, match / n_ref)
