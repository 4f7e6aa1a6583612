"""LLM-training-data operators (north-star extension, BASELINE.json).

- ``dedup``      — exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
                   cosine near-dup.
- ``similarity`` — brute-force cosine top-k (exact baseline) and
                   random-hyperplane LSH ANN (scale path).
- ``text``       — tokenization, quality scoring, language-ID heuristic,
                   fingerprinting.
- ``multimodal`` — binary media columns with typed metadata; decode /
                   feature plumbing via mapInPandas (codecs stubbed —
                   not in this container).
"""

from . import ann_index, curate, dedup, multimodal, quality, sampling, similarity, text  # noqa: F401
