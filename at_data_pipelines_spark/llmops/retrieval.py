"""BM25 ranked retrieval over a document corpus.

Okapi BM25 (Robertson & Zaragoza 2009, the Lucene-default scoring
formula) expressed as a pure DataFrame plan: tokenize → term-filtered
inverted postings (doc, term, tf) → document frequencies → score. No
index structure is materialized — at 100 TB the postings build IS the
inverted index, and the plan shape is the classic one:

- the tokenize/explode is map-side, pruned to the query terms BEFORE the
  shuffle (the filter on the exploded term cuts the postings to only
  the terms being scored — a thousand-fold reduction for short queries);
- document frequencies and the corpus aggregate (N, avgdl) are tiny and
  broadcast;
- the per-(doc, term) score is one codegen projection; the final top-k
  is a TakeOrderedAndProject, never a global sort.

The idf uses the non-negative Lucene form ``ln(1 + (N - df + .5)/(df + .5))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_per_term(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(doc_id, term) BM25 partial scores for the given query terms —
    columns ``doc_id, term, s``. Summing ``s`` over a document's matched
    terms gives the document's BM25 score for the query; callers that
    need bit-reproducible totals should add the per-term values in a
    fixed order (see q65) instead of a float SUM aggregate.

    Duplicate ``query_terms`` are collapsed (first occurrence kept):
    query term frequency is saturated at 1, i.e. the classic BM25 with
    the qtf factor at its k3→0 limit (Robertson & Zaragoza 2009 §3.3) —
    a repeated term must not silently double its contribution."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    query_terms = list(dict.fromkeys(query_terms))
    # split on ANY whitespace run and drop empties: a newline-separated
    # document must still match its terms, and runs of spaces must not
    # inflate dl with empty tokens
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
    # r17 (guide §2.4, remove a whole pass): the per-term document
    # frequencies ride the corpus-stats aggregate — df(term) = number of
    # docs whose token array contains the term, exactly the count of
    # (doc, term) groups with tf >= 1 that the r16 plan re-derived by
    # re-tokenizing the whole corpus in a separate dfreq branch (Catalyst
    # can't reuse the tf exchange across the branches: column pruning
    # makes the subtrees non-identical, so the before-plan shows 3 full
    # corpus scans). One conditional count per query term in the stats
    # pass is a few array_contains per doc inside codegen; the plan drops
    # to 2 corpus scans (postings + stats) and the dfreq broadcast JOIN
    # disappears — the df values arrive on the same 1-row broadcast as
    # n_docs/avgdl and are selected per posting by a term CASE.
    corpus = base.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size("_toks")).alias("avgdl"),
        *[
            F.count(F.when(F.array_contains("_toks", F.lit(t)), F.lit(1))).alias(
                f"_df{i}"
            )
            for i, t in enumerate(query_terms)
        ],
    )
    # r16 (guide §2.4): dl rides ALONG with the postings through the
    # explode and the tf aggregate (max of a per-doc constant) instead of
    # being recomputed by a separate tokenize pass and attached with a
    # join — one less full tokenize of the corpus and one less join.
    postings = base.select(
        "doc_id", F.size("_toks").alias("dl"), F.explode("_toks").alias("term")
    ).filter(F.col("term").isin(list(query_terms)))
    tf = postings.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.max("dl").alias("dl")
    )
    scored = tf.crossJoin(F.broadcast(corpus))
    dfc = F.when(F.col("term") == query_terms[0], F.col("_df0"))
    for i, t in enumerate(query_terms[1:], start=1):
        dfc = dfc.when(F.col("term") == t, F.col(f"_df{i}"))
    scored = scored.withColumn("df", dfc)
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    s = (
        idf
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    return scored.select("doc_id", "term", s.alias("s"))


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for one query (the OR of ``query_terms``), ranked
    by summed BM25 score (desc, doc_id tiebreak). The per-term partials
    are added in the fixed order of ``query_terms`` — conditional sums,
    one posting per (doc, term), so the total is bit-reproducible across
    engines and runs (a float SUM aggregate is not). Duplicate query
    terms contribute ONCE (binary qtf — see ``bm25_per_term``)."""
    query_terms = list(dict.fromkeys(query_terms))
    per_term = bm25_per_term(docs, query_terms, k1, b, id_col, text_col)
    parts = [
        F.coalesce(
            F.sum(F.when(F.col("term") == t, F.col("s"))), F.lit(0.0)
        ).alias(f"_s{i}")
        for i, t in enumerate(query_terms)
    ]
    agg = per_term.groupBy("doc_id").agg(*parts)
    total = F.col("_s0")
    for i in range(1, len(query_terms)):
        total = total + F.col(f"_s{i}")
    return (
        agg.select("doc_id", F.round(total, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(top_k)
    )
