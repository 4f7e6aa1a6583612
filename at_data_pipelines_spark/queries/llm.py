"""LLM-training-data operator queries over documents/embeddings.

First tranche: exact dedup, token statistics, prefix fingerprinting.
(MinHash-LSH, SimHash, n-gram Jaccard, embedding ANN land in the llmops
module with their own oracle queries.)

Scale notes: all of these are single-pass groupBy-on-digest shapes — the
canonical 100 TB dedup plan (hash shuffle on the digest, map-side partial
aggregation, no skew since digests are uniform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .registry import register


# --------------------------------------------------------------------------
# q40 — exact dedup by content hash: keep-lowest-id per md5 group.
# --------------------------------------------------------------------------
@register(
    "q40_exact_dedup",
    oracle="""
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def q40_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies")
    )


# --------------------------------------------------------------------------
# q41 — token statistics: whitespace tokenization, counts + ratios.
# --------------------------------------------------------------------------
@register(
    "q41_token_stats",
    oracle="""
    SELECT doc_id,
           n_chars,
           LEN(string_split(text, ' ')) AS n_tokens,
           ROUND(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                 / LEN(string_split(text, ' ')), 6) AS avg_token_len
    FROM documents
    """,
)
def q41_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        "n_chars",
        F.size(tokens).alias("n_tokens"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size(tokens),
            6,
        ).alias("avg_token_len"),
    )


# --------------------------------------------------------------------------
# q42 — prefix fingerprint: digest of the first 5 tokens → duplicate-group
#        census (a cheap near-dup candidate generator).
# --------------------------------------------------------------------------
@register(
    "q42_prefix_fingerprint",
    oracle="""
    SELECT md5(array_to_string(list_slice(string_split(text, ' '), 1, 5), ' '))
             AS fingerprint,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS min_doc_id
    FROM documents
    GROUP BY 1
    """,
)
def q42_prefix_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.array_join(F.slice(F.split(F.col("text"), " "), 1, 5), " "))
    return d.groupBy(fp.alias("fingerprint")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id")
    )


# --------------------------------------------------------------------------
# q43 — language/quality heuristics: stopword ratio + length features
#        (reference-free quality scoring for corpus filtering).
# --------------------------------------------------------------------------
_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]


@register(
    "q43_quality_features",
    oracle=f"""
    SELECT doc_id, lang, source,
           LEN(string_split(text, ' ')) AS n_tokens,
           LEN(list_filter(string_split(text, ' '),
               t -> list_contains({_STOPWORDS!r}, t))) AS n_stopwords,
           ROUND(CAST(LEN(list_filter(string_split(text, ' '),
               t -> list_contains({_STOPWORDS!r}, t))) AS DOUBLE)
                 / LEN(string_split(text, ' ')), 6) AS stopword_ratio
    FROM documents
    """,
)
def q43_quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    sw = F.array([F.lit(s) for s in _STOPWORDS])
    # count stopword OCCURRENCES (not distinct), matching the SQL list_filter
    n_stop = F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.size(tokens).alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        F.round(n_stop.cast("double") / F.size(tokens), 6).alias("stopword_ratio"),
    )


# --------------------------------------------------------------------------
# q44 — word frequency via explode (R4) — corpus vocabulary census.
# --------------------------------------------------------------------------
@register(
    "q44_word_frequency",
    oracle="""
    SELECT word, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
    """,
)
def q44_word_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("word"))
    return words.groupBy("word").agg(
        F.count("*").alias("freq"), F.countDistinct("doc_id").alias("n_docs")
    )
