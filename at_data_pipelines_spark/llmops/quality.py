"""Trainable corpus-quality classifier — the fastText-style linear
filter of CCNet/GPT-3-era pipelines (label docs good/bad, score the
corpus, keep above a threshold), built entirely from JVM-side column
operations so it trains and scores at corpus scale with no Python in
the hot path.

Model: multinomial Naive Bayes over hash-bucketed tokens (the hashing
trick caps model size at ``n_buckets`` regardless of vocabulary). For
token t with hash bucket h(t):

    log_odds[h] = log P(h | pos) − log P(h | neg)      (Laplace-smoothed)
    score(doc)  = prior_logit + Σ_tokens log_odds[h(token)]

which is exactly a linear classifier with tied weights per bucket —
what fastText learns by SGD, obtained here in closed form from two
count aggregations. The model is a small DataFrame (≤ n_buckets rows),
broadcast into the scoring join.

Shapes: training = explode tokens → groupBy (bucket) with conditional
sums → one small model table. Scoring = explode tokens → broadcast join
on bucket → per-doc sum. Both are single-shuffle plans on uniform keys.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import log

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class TokenClassifier:
    """Handle on a trained model: the per-bucket log-odds table plus the
    class-prior logit. ``model`` is lakehouse-persistable as-is
    (PK ``bucket``)."""

    model: DataFrame  # (bucket long, log_odds double)
    prior_logit: float
    n_buckets: int
    salt: str
    # NB log-odds of a bucket with ZERO training tokens: both class
    # likelihoods collapse to the smoothing mass, leaving
    # log(tn + s*B) - log(tp + s*B) — nonzero whenever the class token
    # totals are imbalanced (0.0 only in the balanced case)
    unseen_log_odds: float = 0.0


def _bucket(token_col, n_buckets: int, salt: str):
    return F.pmod(F.xxhash64(token_col, F.lit(salt)), F.lit(n_buckets))


def train_token_classifier(
    docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_buckets: int = 1 << 16,
    smoothing: float = 1.0,
    salt: str = "quality-v1",
) -> TokenClassifier:
    """Fit the NB log-odds table from labeled documents (``label_col``
    boolean or 0/1: truthy = high quality). Two tiny driver collects
    (class totals and the model table's aggregate) — token counting and
    bucket aggregation are fully distributed."""
    lbl = F.col(label_col).cast("int")
    toks = docs.select(
        lbl.alias("_y"), F.explode(F.split(F.col(text_col), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    per_bucket = (
        toks.groupBy(_bucket(F.col("tok"), n_buckets, salt).alias("bucket"))
        .agg(
            F.sum("_y").alias("n_pos"),
            F.sum(1 - F.col("_y")).alias("n_neg"),
        )
    )
    totals = per_bucket.agg(
        F.sum("n_pos").alias("tp"), F.sum("n_neg").alias("tn")
    ).collect()[0]
    tp, tn = int(totals.tp or 0), int(totals.tn or 0)
    if tp == 0 or tn == 0:
        raise ValueError("need tokens from BOTH classes to train")
    # log P(bucket|class) with Laplace smoothing over the bucket space
    denom_p = log(tp + smoothing * n_buckets)
    denom_n = log(tn + smoothing * n_buckets)
    model = per_bucket.select(
        "bucket",
        (
            F.log(F.col("n_pos") + F.lit(smoothing))
            - F.lit(denom_p)
            - F.log(F.col("n_neg") + F.lit(smoothing))
            + F.lit(denom_n)
        ).alias("log_odds"),
    )
    n_docs = docs.groupBy().agg(
        F.sum(lbl).alias("p"), F.sum(1 - lbl).alias("n")
    ).collect()[0]
    prior = log((int(n_docs.p) + smoothing) / (int(n_docs.n) + smoothing))
    return TokenClassifier(model, prior, n_buckets, salt, denom_n - denom_p)


def score_token_classifier(
    corpus: DataFrame,
    clf: TokenClassifier,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document: ``(id, quality_logit)``, higher = more like
    the positive class. Unseen buckets contribute the smoothed
    unseen-token term ``log(tn+sB) - log(tp+sB)`` (``≈ 0`` only when
    class token totals are balanced) — a garbage/unseen-vocabulary
    document is pushed toward the SMALLER class per token, exactly as
    the NB model dictates. One explode + broadcast model join + one
    groupBy — no Python anywhere.

    EVERY corpus document gets a row: a token-less document (empty or
    whitespace-only text) has no evidence, so it scores exactly the
    class-prior logit — it is not silently dropped (the explode produces
    no rows for it, so the token sums are left-joined back onto the
    corpus ids)."""
    toks = corpus.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    keyed = toks.select(
        id_col, _bucket(F.col("tok"), clf.n_buckets, clf.salt).alias("bucket")
    )
    joined = keyed.join(F.broadcast(clf.model), "bucket", "left")
    sums = joined.groupBy(id_col).agg(
        F.sum(
            F.coalesce(F.col("log_odds"), F.lit(clf.unseen_log_odds))
        ).alias("_s")
    )
    return (
        corpus.select(id_col)
        .join(sums, id_col, "left")
        .select(
            id_col,
            (F.coalesce(F.col("_s"), F.lit(0.0)) + F.lit(clf.prior_logit)).alias(
                "quality_logit"
            ),
        )
    )


def filter_by_quality(
    corpus: DataFrame,
    clf: TokenClassifier,
    min_logit: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents scoring at least ``min_logit`` (0.0 = 'more likely
    positive than negative under the model + prior')."""
    scores = score_token_classifier(corpus, clf, text_col, id_col)
    kept = scores.filter(F.col("quality_logit") >= min_logit).select(id_col)
    return corpus.join(kept, id_col, "left_semi")
