"""Word-count pipeline (reference A1-A5, A13).

The reference counts words with a per-mapper in-memory hash map
(``MapRedWord2Vec.scala:89,107-112``) and sums counts in the reducer
(``:201,218``). In Spark the identical physical shape — map-side
partial aggregation, one shuffle on the word, final aggregation —
falls out of ``groupBy("word").count()`` automatically (Catalyst
splits hash aggregation into partial/final; SURVEY §4.1).

Scale note: the only shuffle is on ``word`` — high-cardinality and
near-uniform after lowercasing, so there is no skew problem short of
stopword-dominated corpora; partial aggregation collapses each
partition to its distinct words before the exchange, exactly like the
reference's combiner-style mapper map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_word2vec_spark.functions.text import explode_words


def word_counts(lines: DataFrame, text_col: str = "value") -> DataFrame:
    """(word, count) over reference-tokenized text; A2-A5+A13."""
    words = explode_words(lines.select(text_col), text_col)
    return words.groupBy("word").agg(F.count("*").alias("count"))


def corpus_word_counts(spark, path: str) -> DataFrame:
    """Full reference count path: text scan (A1) → word_counts."""
    from mapreduce_word2vec_spark.sources.readers import read_text_corpus

    return word_counts(read_text_corpus(spark, path), "value")
