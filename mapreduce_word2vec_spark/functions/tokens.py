"""Token-id scalar function (reference A10).

The reference BPE-encodes each word with JTokkit's ``cl100k_base`` and
keeps ONLY the first token id (``MapRedWord2Vec.scala:69-70,170`` —
``.get(0)``; multi-token words are truncated). That truncation is
preserved verbatim here.

``tiktoken`` is not available in this environment, so the engine uses
a deterministic fallback: a stable polynomial hash of the word's
UTF-8 bytes mod 100,000 (within cl100k's id range). The fallback is a
*documented divergence* — same signature, same nullability, same
first-token-only semantics, different id values — and is golden-tested
rather than oracle-compared (SURVEY §2.B marks A10 "golden"). When
``tiktoken`` is importable the real encoding is used automatically.

Implemented as an Arrow-vectorized pandas UDF (the engine's archetypal
scalar UDF): one Python crossing per batch, not per row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - exercised only where tiktoken exists
    import tiktoken

    _ENCODING = tiktoken.get_encoding("cl100k_base")
except Exception:  # pragma: no cover
    _ENCODING = None

_FALLBACK_MOD = 100_000
_FALLBACK_BASE = 257


def first_token_id_py(word: str | None) -> int | None:
    """Plain-Python reference implementation (used by tests/goldens)."""
    if word is None:
        return None
    if _ENCODING is not None:
        ids = _ENCODING.encode(word)
        return ids[0] if ids else None
    h = 0
    for b in word.encode("utf-8"):
        h = (h * _FALLBACK_BASE + b) % _FALLBACK_MOD
    return h


@F.pandas_udf(T.LongType())
def first_token_id(words: pd.Series) -> pd.Series:
    return words.map(first_token_id_py).astype("Int64")


def fallback_token_id_expr(word) -> "F.Column":
    """The fallback token id as a PURE Catalyst expression (no Python
    crossing): polynomial fold over the word's character codes — for
    ASCII words this equals :func:`first_token_id_py`'s fallback on
    UTF-8 bytes, which makes token-id-bearing outputs oracle-able.
    The pandas UDF above remains the A10 archetype (and upgrades to
    real cl100k when tiktoken exists); this is the portable JVM-side
    variant used where cross-engine determinism is required."""
    col = F.col(word) if isinstance(word, str) else word
    codes = F.transform(F.split(col, ""), lambda c: F.ascii(c))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * _FALLBACK_BASE + c) % _FALLBACK_MOD,
    )
