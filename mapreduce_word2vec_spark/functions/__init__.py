from mapreduce_word2vec_spark.functions import text, tokens, vectors

__all__ = ["text", "tokens", "vectors"]
