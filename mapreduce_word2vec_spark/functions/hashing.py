"""Overflow-safe multiplicative-hash constants shared by the plan
modules and their DuckDB oracle SQL.

The engine's deterministic sampling/masking queries hash integer ids
with Knuth multiplicative hashing. The classic 32-bit constant
(2654435761) is an int64 landmine: once the multiplicand exceeds
~3.47e9 the product crosses 2^63 and the three engines disagree —
Spark (non-ANSI) wraps silently, DuckDB raises an overflow error, and
Python bigints keep going. The full-catalog sf0.1 gate caught exactly
this in ``doc_span_corruption`` (3475010432 * 2654435761 > 2^63-1).

The safe pattern, used by every hash site in the plan tree:

1. Fold the id into 32 bits FIRST: ``id % MASK32``.
2. Multiply by a 31-bit constant: ``KNUTH31 < 2^31``, so the product
   is at most ``(2^32-1) * (2^31-1) = 2^63 - 2^32 - 2^31 + 1 < 2^63``
   — exact in int64 in every engine, at ANY id magnitude.
3. Mix extra terms (replicate index, span group, …) BEFORE the
   multiply and reduce mod ``MASK32`` again so step 2's bound holds.

``KNUTH31`` is floor(2^31 / phi) rounded to odd (Fibonacci hashing
wants an odd multiplier); bucket/threshold consumers should read the
HIGH bits of the 32-bit product (``>> 16``) — multiplicative hashing
mixes into the high half, the low bits stay nearly linear in the id.
"""

MASK32 = 4_294_967_296  # 2^32 — the fold modulus / hash range
KNUTH31 = 1_327_217_885  # floor(2^31 / phi), odd — 31-bit multiplier
