"""Train the frozen quality-classifier weights (run offline, once).

Produces the logistic-regression weight vector frozen in
``pdf_extractor_spark/functions/quality_model.py``. Deterministic:
seeded corpus synthesis, full-batch gradient descent with a fixed
iteration count, weights rounded to 4 decimals. Re-running this script
reproduces the frozen constants bit-for-bit.

The training set is synthesized here (no external data): positives are
prose-shaped documents (stopword-bearing sentences, ordinary
punctuation); negatives are the web-junk classes a model-based quality
filter exists to remove (keyword stuffing / link-farm lists,
digit-heavy tables, repeated-token spam). Feature definitions are the
exact Python twins of the SQL in ``quality_model.py`` — the frozen
model is only valid while the two stay in lockstep (pinned by
``tests/test_quality_model.py``).

Usage:  python scripts/train_quality_model.py
"""

from __future__ import annotations

import random
import sys

import numpy as np

sys.path.insert(0, ".")

from pdf_extractor_spark.functions.textstats import EN_STOPWORDS

_WORDS = (
    "analysis data method result system model value process time "
    "research field study report change growth market level case "
    "group work part form place right line city area team game"
).split()

_SPAM_KEYWORDS = (
    "cheap discount sale buy click here free offer deal best top "
    "casino pills viagra loans insurance credit mortgage forex"
).split()


def _positive(rng: random.Random) -> str:
    n_sent = rng.randint(4, 9)
    sents = []
    for _ in range(n_sent):
        n = rng.randint(6, 14)
        words = []
        for i in range(n):
            if i % 3 == 1:
                words.append(rng.choice(EN_STOPWORDS))
            else:
                words.append(rng.choice(_WORDS))
        s = " ".join(words)
        sents.append(s[0].upper() + s[1:] + rng.choice([".", ".", "?"]))
    return " ".join(sents)


def _negative(rng: random.Random) -> str:
    kind = rng.randrange(3)
    if kind == 0:  # keyword stuffing / link-farm anchor list
        n = rng.randint(15, 60)
        return " ".join(rng.choice(_SPAM_KEYWORDS) for _ in range(n))
    if kind == 1:  # digit-heavy table dump
        n = rng.randint(20, 80)
        return " ".join(
            str(rng.randint(0, 999999)) if rng.random() < 0.7
            else rng.choice(_WORDS)
            for _ in range(n)
        )
    # repeated-token spam
    w = rng.choice(_SPAM_KEYWORDS + _WORDS)
    n = rng.randint(20, 70)
    return " ".join(
        w if rng.random() < 0.8 else rng.choice(_WORDS)
        for _ in range(n)
    )


def features(text: str) -> list[float]:
    """Python twin of the SQL feature block in quality_model.py."""
    toks = text.split(" ")
    n_tokens = len(toks)
    n_chars = len(text)
    stop = set(EN_STOPWORDS)
    f_len = min(n_tokens / 100.0, 1.0)
    f_stop = sum(1 for t in toks if t in stop) / n_tokens
    no_punct = "".join(
        c for c in text if c.isascii() and (c.isalnum() or c == " ")
    )
    f_punct = (n_chars - len(no_punct)) / n_chars if n_chars else 0.0
    n_digit = sum(1 for c in text if c.isdigit() and c.isascii())
    f_digit = n_digit / n_chars if n_chars else 0.0
    f_rep = len(set(toks)) / n_tokens
    f_wordshape = min((n_chars / n_tokens) / 10.0, 1.0)
    return [f_len, f_stop, f_punct, f_digit, f_rep, f_wordshape]


def main() -> None:
    rng = random.Random(42)
    xs, ys = [], []
    for _ in range(300):
        xs.append(features(_positive(rng)))
        ys.append(1.0)
    for _ in range(300):
        xs.append(features(_negative(rng)))
        ys.append(0.0)
    x = np.array(xs)
    y = np.array(ys)
    x = np.hstack([np.ones((len(x), 1)), x])  # bias column
    w = np.zeros(x.shape[1])
    for _ in range(5000):  # full-batch GD: deterministic
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        w -= 0.5 * (x.T @ (p - y)) / len(y)
    p = 1.0 / (1.0 + np.exp(-(x @ w)))
    acc = float(np.mean((p > 0.5) == (y == 1.0)))
    names = ["bias", "f_len", "f_stop", "f_punct", "f_digit",
             "f_rep", "f_wordshape"]
    print(f"train accuracy: {acc:.4f} on {len(y)} docs")
    print("WEIGHTS = {")
    for n, v in zip(names, w):
        print(f'    "{n}": {round(float(v), 4)},')
    print("}")


if __name__ == "__main__":
    main()
