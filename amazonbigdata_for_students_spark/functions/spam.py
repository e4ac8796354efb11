"""Spam classifier (SURVEY.md §2.10 U1; reference diagram comp. 9).

A tiny multinomial naive-Bayes over token counts, implemented in numpy
(no sklearn in the image), trained deterministically on the bundled
corpus. Serving is an Arrow-batched pandas UDF: the model is a plain
dict broadcast to executors once, scoring is vectorized per batch —
never a row-at-a-time Python UDF.

The reference marks a SageMaker-endpoint variant optional; the pluggable
seam here is `score_udf(model)` — an endpoint-backed scorer would be a
`mapInPandas` doing batched HTTP with the same output schema.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

_TOKEN_RE = re.compile(r"[a-z0-9']+")


def _tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


@dataclass(frozen=True)
class NBModel:
    log_prior_spam: float
    log_prior_ham: float
    log_lik_spam: dict[str, float]
    log_lik_ham: dict[str, float]
    default_spam: float
    default_ham: float


def train(texts: list[str], labels: list[bool], alpha: float = 1.0) -> NBModel:
    """Multinomial NB with Laplace smoothing; fully deterministic."""
    spam_counts: Counter[str] = Counter()
    ham_counts: Counter[str] = Counter()
    n_spam = n_ham = 0
    for text, is_spam in zip(texts, labels):
        toks = _tokens(text)
        if is_spam:
            spam_counts.update(toks)
            n_spam += 1
        else:
            ham_counts.update(toks)
            n_ham += 1
    vocab = set(spam_counts) | set(ham_counts)
    v = len(vocab)
    tot_s = sum(spam_counts.values())
    tot_h = sum(ham_counts.values())
    return NBModel(
        log_prior_spam=math.log(n_spam / (n_spam + n_ham)),
        log_prior_ham=math.log(n_ham / (n_spam + n_ham)),
        log_lik_spam={w: math.log((spam_counts[w] + alpha) / (tot_s + alpha * v)) for w in vocab},
        log_lik_ham={w: math.log((ham_counts[w] + alpha) / (tot_h + alpha * v)) for w in vocab},
        default_spam=math.log(alpha / (tot_s + alpha * v)),
        default_ham=math.log(alpha / (tot_h + alpha * v)),
    )


def default_model() -> NBModel:
    from ..fixtures import HAM_LINES, SPAM_LINES

    texts = list(SPAM_LINES) + list(HAM_LINES)
    labels = [True] * len(SPAM_LINES) + [False] * len(HAM_LINES)
    return train(texts, labels)


def _score_series(model: NBModel, texts: pd.Series) -> pd.Series:
    def score(text: str) -> float:
        ls, lh = model.log_prior_spam, model.log_prior_ham
        for tok in _tokens(text or ""):
            ls += model.log_lik_spam.get(tok, model.default_spam)
            lh += model.log_lik_ham.get(tok, model.default_ham)
        # logistic over the log-odds = P(spam | text)
        return 1.0 / (1.0 + math.exp(min(max(lh - ls, -700.0), 700.0)))

    return texts.map(score)


def score_udf(model: NBModel | None = None) -> Column:
    """Factory for the Arrow-batched scorer; returns a pandas UDF column
    function usable as ``spam_score(concat(title, ' ', text))``."""
    model = model or default_model()

    @F.pandas_udf(T.DoubleType())
    def spam_score(texts: pd.Series) -> pd.Series:
        return _score_series(model, texts)

    return spam_score


# --- quantized decision path (cross-engine hash-checkable) -----------------
# Summing floats is order-dependent, so a float decision boundary can
# disagree between engines in the last bit. Quantizing the per-token
# log-odds to integers makes the score an exact, order-free integer sum —
# Spark's pandas UDF and a DuckDB VALUES-table oracle then agree
# bit-for-bit on every label.
_QUANT = 10**6


def quantized_weights(model: NBModel | None = None) -> tuple[dict[str, int], int, int]:
    """Per-token integer log-odds, plus (default, prior) integer terms.
    Decision rule: prior + sum(weights of tokens) >= 0 ⇒ spam — identical
    to spam_score >= 0.5 up to the 1e-6 quantization."""
    model = model or default_model()
    w = {
        t: round((model.log_lik_spam[t] - model.log_lik_ham[t]) * _QUANT)
        for t in model.log_lik_spam
    }
    default = round((model.default_spam - model.default_ham) * _QUANT)
    prior = round((model.log_prior_spam - model.log_prior_ham) * _QUANT)
    return w, default, prior


def is_spam_udf(model: NBModel | None = None) -> Column:
    """Arrow-batched boolean classifier over the quantized weights."""
    w, default, prior = quantized_weights(model)

    @F.pandas_udf(T.BooleanType())
    def is_spam(texts: pd.Series) -> pd.Series:
        def decide(text: str) -> bool:
            s = prior
            for tok in _tokens(text or ""):
                s += w.get(tok, default)
            return s >= 0

        return texts.map(decide)

    return is_spam


def spam_oracle_sql(
    model: NBModel | None = None,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of is_spam_udf: the 154-token vocabulary inlined as a
    VALUES table, same tokenizer regex, same integer decision rule."""
    w, default, prior = quantized_weights(model)
    values = ", ".join(
        "('{}', {})".format(t.replace("'", "''"), v) for t, v in sorted(w.items())
    )
    return f"""
    WITH tok AS (
      SELECT {id_col},
             unnest(regexp_extract_all(lower({text_col}), '[a-z0-9'']+')) AS tok
      FROM {table}
    ),
    w(tok, dw) AS (VALUES {values}),
    scored AS (
      SELECT {id_col}, sum(coalesce(w.dw, {default})) AS s
      FROM tok LEFT JOIN w USING (tok)
      GROUP BY {id_col}
    )
    SELECT d.{id_col}, CAST(coalesce(s.s, 0) + {prior} >= 0 AS BOOLEAN) AS is_spam
    FROM {table} d LEFT JOIN scored s USING ({id_col})
    """


def classify_reviews(
    reviews: DataFrame,
    model: NBModel | None = None,
    threshold: float = 0.5,
    title_col: str = "review_title",
    text_col: str = "review_text",
) -> DataFrame:
    """P6 — add spam_score + is_spam to a reviews DataFrame."""
    scorer = score_udf(model)
    full_text = F.concat_ws(" ", F.col(title_col), F.col(text_col))
    return reviews.withColumn("spam_score", scorer(full_text)).withColumn(
        "is_spam", F.col("spam_score") >= threshold
    )
