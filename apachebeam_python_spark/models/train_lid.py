"""Deterministic trainer for the language-ID model (SURVEY §2.10).

Softmax (multinomial logistic) regression over character-frequency features
— full-batch gradient descent in float64, zero-initialized, fixed step
count: bit-reproducible with no RNG at all. ``python -m
apachebeam_python_spark.models.train_lid`` rewrites ``lid_model_v1.json``;
tests/test_run_inference.py asserts retraining reproduces the committed
weights and pins the held-out accuracy.

The FEATURE SPEC lives here because three consumers must agree exactly:
this trainer, the Arrow-batched inference handler
(operators/inference.py), and the generated DuckDB oracle SQL
(queries/udfs.py). Features are ``count(char) / length`` over the
lowercased text (one CJK-range ratio for zh), so the DuckDB twin can
compute the identical float64 value via length/replace arithmetic.
"""

from __future__ import annotations

import json
import pathlib
from collections import Counter

import numpy as np

#: ordered feature characters: a-z, then the accented letters that separate
#: de/fr/es (NFC single codepoints — Python len == DuckDB length).
FEATURE_CHARS: list[str] = list("abcdefghijklmnopqrstuvwxyz") + [
    "á", "à", "â", "ä", "ç", "é", "è", "ê", "ë", "í", "î", "ï",
    "ñ", "ó", "ô", "ö", "ú", "ù", "û", "ü", "ß",
]
#: substring features (function words / character clusters). Still SQL-twin
#: friendly: count(s) == (length(t) - length(replace(t, s, ''))) / length(s)
#: — non-overlapping left-to-right in BOTH Python str.count and SQL replace.
FEATURE_SUBSTRINGS: list[str] = [
    " the ", " and ", " of ", "ing ",                     # en
    " der ", " die ", " und ", " das ", "sch", "ei",      # de
    " le ", " la ", " les ", " et ", " que ", "l'", "ou", # fr
    " el ", " los ", " y ", "ción", " se ", "os ",        # es
    " de ", " a ", "en ",                                 # shared — let GD weigh
]
#: one extra feature: fraction of chars in the CJK Unified Ideographs block.
CJK_LO, CJK_HI = "一", "鿿"
N_FEATURES = len(FEATURE_CHARS) + len(FEATURE_SUBSTRINGS) + 1

ARTIFACT = pathlib.Path(__file__).with_name("lid_model_v1.json")


def featurize(texts: list[str]) -> np.ndarray:
    """float64 [n, N_FEATURES] — count/length over lowercased text.

    Parity contract: for each feature the value is ``CAST(count AS DOUBLE) /
    CAST(max(len, 1) AS DOUBLE)`` — a single IEEE division of two exact
    integers, so DuckDB's length/replace twin produces the bit-identical
    double.
    """
    out = np.zeros((len(texts), N_FEATURES), dtype=np.float64)
    for i, text in enumerate(texts):
        t = (text or "").lower()
        dlen = float(max(len(t), 1))
        cnt = Counter(t)
        for j, c in enumerate(FEATURE_CHARS):
            out[i, j] = cnt.get(c, 0) / dlen
        base = len(FEATURE_CHARS)
        for j, s in enumerate(FEATURE_SUBSTRINGS):
            out[i, base + j] = t.count(s) / dlen
        out[i, -1] = sum(v for k, v in cnt.items() if CJK_LO <= k <= CJK_HI) / dlen
    return out


def train(
    X: np.ndarray,
    y: np.ndarray,
    n_classes: int,
    *,
    lr: float = 5.0,
    iters: int = 20000,
    l2: float = 1e-4,
) -> tuple[np.ndarray, np.ndarray]:
    """Full-batch softmax regression; returns (W [K, D], b [K])."""
    n, d = X.shape
    W = np.zeros((n_classes, d))
    b = np.zeros(n_classes)
    T = np.eye(n_classes)[y]  # one-hot [n, K]
    for _ in range(iters):
        z = X @ W.T + b
        z -= z.max(axis=1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=1, keepdims=True)
        g = (p - T) / n  # [n, K]
        W -= lr * (g.T @ X + l2 * W)
        b -= lr * g.sum(axis=0)
    return W, b


def build_model() -> dict:
    """Train on the committed corpus (holdout excluded) and evaluate."""
    from .lid_corpus import CORPUS, split

    classes = sorted(CORPUS)
    tr_texts, tr_y, ho_texts, ho_y = [], [], [], []
    for k, lang in enumerate(classes):
        tr, ho = split(lang)
        tr_texts += tr
        tr_y += [k] * len(tr)
        ho_texts += ho
        ho_y += [k] * len(ho)
    W, b = train(featurize(tr_texts), np.asarray(tr_y), len(classes))
    # weights rounded to 8 dp: keeps the artifact diffable; repr() of the
    # rounded float round-trips exactly into both engines.
    W8 = np.round(W, 8)
    b8 = np.round(b, 8)
    ho_pred = (featurize(ho_texts) @ W8.T + b8).argmax(axis=1)
    acc = float((ho_pred == np.asarray(ho_y)).mean())
    # exact holdout confusion counts (round 9, VERDICT r8 #6): pinned in the
    # artifact so tests can assert the same counts out of BOTH engines
    confusion: dict[str, dict[str, int]] = {c: {} for c in classes}
    for t, p in zip(ho_y, ho_pred):
        row = confusion[classes[t]]
        row[classes[p]] = row.get(classes[p], 0) + 1
    return {
        "version": 1,
        "task": "language-id over character frequencies",
        "classes": classes,
        "feature_chars": FEATURE_CHARS,
        "feature_substrings": FEATURE_SUBSTRINGS,
        "cjk_range": [CJK_LO, CJK_HI],
        "weights": {c: [float(w) for w in W8[k]] for k, c in enumerate(classes)},
        "bias": {c: float(b8[k]) for k, c in enumerate(classes)},
        "train_config": {"lr": 5.0, "iters": 20000, "l2": 1e-4, "init": "zeros"},
        "train_sentences": len(tr_texts),
        "holdout_sentences": len(ho_texts),
        "holdout_accuracy": acc,
        "holdout_confusion": confusion,
    }


def main() -> None:
    model = build_model()
    ARTIFACT.write_text(json.dumps(model, ensure_ascii=False, indent=1) + "\n")
    print(f"wrote {ARTIFACT} — holdout accuracy {model['holdout_accuracy']:.3f}")


if __name__ == "__main__":
    main()
