"""Randomized parity fuzz (SURVEY §5.3): the engine's trickiest
cross-implementation contracts checked on thousands of random inputs
in single Spark jobs.

* Tokenizer: Spark ``split/rlike`` (Java regex) vs Python ``re`` with
  ``re.ASCII`` — the exact M:102 semantics, including unicode,
  digits, underscores, empty and whitespace-only lines.
* Fingerprint/string-hash: Catalyst fold vs pure-Python fold.
* Cosine: Catalyst HOF expression vs numpy.
"""

from __future__ import annotations

import math
import random
import re
import string

from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreduce_word2vec_spark.functions.text import (
    FINGERPRINT_BASE,
    FINGERPRINT_MOD,
    fingerprint_expr,
    string_hash_expr,
    tokens_expr,
)
from mapreduce_word2vec_spark.functions.vectors import cosine_expr

_ALPHABET = (
    string.ascii_letters
    + string.digits
    + "_-.,;:!?'\"()[]{} \t"
    + "äöüßéàçñ漢字русский🙂"
)


def _random_lines(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    lines = []
    for _ in range(n):
        k = rng.randint(0, 80)
        lines.append("".join(rng.choice(_ALPHABET) for _ in range(k)))
    # adversarial fixed cases
    lines += ["", " ", "___", "123", "a_b c-d", "café", "ΑΒΓ αβγ", "a" * 500]
    return lines


def _py_tokens(line: str) -> list[str]:
    return [
        t
        for t in re.split(r"\W+", line.lower(), flags=re.ASCII)
        if t and t.isalpha() and t.isascii()
    ]


def test_tokenizer_fuzz_matches_python(spark):
    lines = _random_lines(3000, seed=7)
    df = spark.createDataFrame([Row(i=i, text=s) for i, s in enumerate(lines)])
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", tokens_expr("text").alias("toks")).collect()
    }
    for i, s in enumerate(lines):
        assert got[i] == _py_tokens(s), (i, s, got[i], _py_tokens(s))


def _py_string_hash(w: str) -> int:
    h = 0
    for c in w:
        h = (h * FINGERPRINT_BASE + ord(c)) % FINGERPRINT_MOD
    return h


def test_string_hash_and_fingerprint_fuzz(spark):
    rng = random.Random(11)
    words = [
        "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(1, 25)))
        for _ in range(2000)
    ]
    df = spark.createDataFrame([Row(i=i, w=w) for i, w in enumerate(words)])
    got = {
        r["i"]: r["h"]
        for r in df.select("i", string_hash_expr(F.col("w")).alias("h")).collect()
    }
    for i, w in enumerate(words):
        assert got[i] == _py_string_hash(w), (w, got[i])

    # fingerprint over random token arrays
    docs = [
        [rng.choice(words) for _ in range(rng.randint(0, 30))] for _ in range(300)
    ]
    fdf = spark.createDataFrame([Row(i=i, toks=d) for i, d in enumerate(docs)])
    fgot = {
        r["i"]: r["fp"]
        for r in fdf.select("i", fingerprint_expr(F.col("toks")).alias("fp")).collect()
    }
    for i, d in enumerate(docs):
        h = 0
        for w in d:
            h = (h * FINGERPRINT_BASE + _py_string_hash(w)) % FINGERPRINT_MOD
        assert fgot[i] == h, (i, d[:3])


def test_cosine_fuzz_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    pairs = [
        (rng.standard_normal(16).tolist(), rng.standard_normal(16).tolist())
        for _ in range(500)
    ]
    df = spark.createDataFrame([Row(i=i, a=a, b=b) for i, (a, b) in enumerate(pairs)])
    got = {
        r["i"]: r["c"] for r in df.select("i", cosine_expr("a", "b").alias("c")).collect()
    }
    for i, (a, b) in enumerate(pairs):
        a, b = np.array(a), np.array(b)
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert math.isclose(got[i], want, rel_tol=1e-12), (i, got[i], want)
