"""Corpus curation: the end-to-end cleaning pipeline a training-data run
executes — language filter → quality filter → repetition filter →
decontamination → exact dedup → near-dup cluster dedup → (optional)
domain-mixture resample + train/val split — composed from the llmops
operators.

Single logical plan per stage; the only shuffles are the dedup digests
and the near-dup clustering rounds. Returns the curated corpus plus a
one-row funnel-stats frame (rows surviving each stage) so runs are
auditable — at 100 TB the funnel numbers ARE the data-quality report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_clusters, exact_dedup
from .sampling import deterministic_split, mixture_sample
from .text import (
    decontamination_overlap,
    langid,
    quality_features,
    redact_pii,
    repetition_metrics,
    unigram_logprob_score,
)


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    allowed_langs: list[str] | None = None,
    lang_col: str | None = "lang",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    max_stopword_ratio: float = 1.0,
    max_top_gram_frac: float | None = None,
    min_mean_logprob: float | None = None,
    eval_docs: DataFrame | None = None,
    decontaminate_ngram: int = 5,
    near_dup_threshold: float = 0.6,
    target_mixture: dict[str, float] | None = None,
    mixture_col: str = "source",
    val_frac: float | None = None,
    redact: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Returns (curated_df, funnel_stats_df).

    Language filtering uses the provided ``lang_col`` when the corpus has
    one (the reference-data case), else the heuristic ``langid``.
    Optional stages engage when their knob is set: repetition filtering
    (``max_top_gram_frac``), corpus-LM quality floor
    (``min_mean_logprob`` — cuts rare/garbage-token documents), eval-set
    decontamination (``eval_docs``), domain-mixture resampling
    (``target_mixture``), a deterministic train/val split column
    (``val_frac``), and PII redaction of the surviving text
    (``redact=True`` — applied last, so dedup keys/filters see the
    original text).
    """
    in_cols = list(df.columns)  # the curated output keeps the INPUT schema
    n0 = df.count()

    def _pin(d: DataFrame) -> DataFrame:
        # each funnel stage is counted AND consumed by the next stage:
        # without materialization every count re-executes all prior
        # stages (O(stages^2) scans/shuffles of the corpus). A lazy
        # localCheckpoint materializes each stage once, at its count.
        return d.localCheckpoint(eager=False)

    if allowed_langs:
        if lang_col and lang_col in df.columns:
            df = df.filter(F.col(lang_col).isin(allowed_langs))
        else:
            df = langid(df, text_col).filter(F.col("lang_pred").isin(allowed_langs))
    df = _pin(df)
    n_lang = df.count()

    df = quality_features(df, text_col).filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("stopword_ratio") <= max_stopword_ratio)
    )
    df = _pin(df)
    n_quality = df.count()

    if max_top_gram_frac is not None:
        rep = repetition_metrics(df, text_col, id_col, n=2)
        repetitive = rep.filter(F.col("top_gram_frac") > max_top_gram_frac).select(id_col)
        df = df.join(repetitive, id_col, "left_anti")
    if min_mean_logprob is not None:
        lm = unigram_logprob_score(df, text_col, id_col)
        garbage = lm.filter(F.col("mean_logprob") < min_mean_logprob).select(id_col)
        df = df.join(garbage, id_col, "left_anti")
    df = _pin(df)
    n_repetition = df.count()

    if eval_docs is not None:
        tainted = decontamination_overlap(
            df, eval_docs, text_col, id_col, decontaminate_ngram
        ).select(id_col)
        df = df.join(tainted, id_col, "left_anti")
    df = _pin(df)
    n_decontaminated = df.count()

    # exact dedup: keep the lowest id per content digest
    keep_exact = exact_dedup(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    df = _pin(df.join(keep_exact, id_col, "left_semi"))
    n_exact = df.count()

    # near-dup clusters: keep the canonical (min-id) doc per cluster
    clusters = dedup_clusters(df, text_col, id_col, near_dup_threshold)
    keepers = clusters.filter(F.col(id_col) == F.col("cluster")).select(id_col)
    curated = _pin(df.join(keepers, id_col, "left_semi"))
    n_near = curated.count()

    if target_mixture:
        curated = mixture_sample(curated, target_mixture, mixture_col, id_col)
    n_final = curated.count()

    # drop intermediate feature columns (n_tokens, stopword_ratio,
    # lang_pred, ...) — the curated corpus keeps the INPUT schema, plus
    # only the explicitly requested 'split' column below
    curated = curated.select(*in_cols)
    if val_frac is not None:
        curated = deterministic_split(curated, id_col, val_frac)
    if redact:
        curated = curated.withColumn(text_col, redact_pii(text_col))

    stats = df.sparkSession.createDataFrame(
        [(n0, n_lang, n_quality, n_repetition, n_decontaminated, n_exact, n_near, n_final)],
        "n_input long, n_after_lang long, n_after_quality long, "
        "n_after_repetition long, n_after_decontamination long, "
        "n_after_exact_dedup long, n_after_near_dedup long, n_after_mixture long",
    )
    return curated, stats
