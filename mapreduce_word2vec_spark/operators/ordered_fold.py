"""Bounded-memory per-key ordered folds (batch secondary sort).

The per-user replay family (CEP match counting, token-bucket audit,
hysteresis alerting) is inherently sequential per key: the answer is a
deterministic fold over the key's (ts, event_id)-ordered event
sequence. The declarative formulation — ``collect_list`` per key +
``F.aggregate`` — is value-correct but materializes the WHOLE per-key
history as one aggregate cell, which is unspillable task heap: a hot
key with 10^8 events at 100 TB is a guaranteed executor OOM, the same
failure class as the exact-percentile value buffering eradicated in
round 7 (SCALE.md; ``operators/quantiles.py``).

This operator is the scale-safe shape — the classic MapReduce
"secondary sort", expressed Spark-first:

  1. one hash exchange on the key (``repartition``) so each key's rows
     land in one partition;
  2. ``sortWithinPartitions(key, *order)`` — Spark's sort is the
     spillable UnsafeExternalSorter, so an arbitrarily hot key sorts in
     bounded memory;
  3. ONE ``mapInPandas`` pass over the sorted Arrow stream holding the
     caller's O(1) state per key and O(arrow-batch) memory in total.

Keys are contiguous after the sort, so only the single key straddling
a batch boundary carries state across batches; a key's output row is
emitted at its boundary. Runtime for a hot key is linear and
single-task — inherent to any EXACT sequential replay — but memory
never exceeds the Arrow batch plus the emit buffer.

The Python loop is row-at-a-time by necessity (each step consumes the
previous state); it stays off the hot path because the stream it sees
is one narrow projected column set, not the raw rows. Folds whose
transition is associative should NOT come here — use a window or a
two-level aggregate instead (see ``plans/relational.py``'s running
sums); this operator exists for the genuinely non-associative /
finite-state-machine replays.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Iterator, Sequence

from pyspark.sql import DataFrame


def per_key_ordered_fold(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    val_cols: Sequence[str],
    out_schema: str,
    out_cols: Sequence[str],
    init: Callable[[], Any],
    step: Callable[..., Any],
    emit: Callable[[Any, Any], tuple],
) -> DataFrame:
    """Fold each key's (order_cols)-ordered rows with O(1) state.

    ``init() -> state``; ``step(state, *vals) -> state`` where ``vals``
    are the row's ``val_cols`` in order; ``emit(key, state) -> tuple``
    of ``out_cols`` values. All three run inside the Arrow worker;
    they must be pure and pickle-able (top-level or closure over
    constants only).

    NULL keys: Spark's ``repartition`` hashes all NULLs to one
    partition and the ascending sort puts them first, but
    Spark→pandas renders a nullable integer key as float64 NaN — and
    NaN != NaN would open a fresh group per null row (ADVICE r7).
    Null-like keys (None/NaN/NaT) are therefore normalized to one
    group, matching ``groupBy``'s NULL-as-a-single-group semantics;
    ``emit`` receives ``None`` as that group's key, so an ``emit``
    that casts the key (``int(key)``) must either tolerate ``None``
    or the caller must pre-filter ``key_col IS NOT NULL``.

    Float/double ``key_col`` is rejected: a genuine NaN KEY VALUE is
    indistinguishable from pandas' NaN rendering of NULL, and Spark
    treats NULL and NaN as separate groups sorted to opposite ends
    (NULLS FIRST, NaN LAST) — both-present data would emit two
    non-contiguous None-keyed groups (ADVICE r8). The normalization
    above is strictly for nullable-int→float64 rendering.
    """
    from pyspark.sql.types import DoubleType, FloatType

    key_type = df.schema[key_col].dataType
    if isinstance(key_type, (FloatType, DoubleType)):
        raise TypeError(
            f"per_key_ordered_fold: key_col {key_col!r} is {key_type}; "
            "float/double keys are forbidden (NaN keys would collide "
            "with the NULL normalization) — cast to a decimal/string "
            "key or discretize first"
        )
    keep: list[str] = []
    for c in (key_col, *order_cols, *val_cols):
        if c not in keep:
            keep.append(c)
    proj = df.select(*keep)
    part = proj.repartition(key_col).sortWithinPartitions(key_col, *order_cols)
    cols = list(val_cols)
    out_cols = list(out_cols)

    def run(batches: Iterable) -> Iterator:
        import pandas as pd

        cur: Any = None
        have_key = False
        state: Any = None
        out: list[tuple] = []
        for pdf in batches:
            keys = pdf[key_col].to_numpy()
            arrs = [pdf[c].to_numpy() for c in cols]
            for i in range(len(keys)):
                k = keys[i]
                # Null-like (None/NaN/NaT) keys form ONE group; NaN's
                # self-inequality would otherwise split them per-row.
                if k is None or k != k:
                    k = None
                if not have_key or k != cur:
                    if have_key:
                        out.append(emit(cur, state))
                    cur, state, have_key = k, init(), True
                state = step(state, *(a[i] for a in arrs))
            if len(out) >= 4096:
                yield pd.DataFrame(out, columns=out_cols)
                out = []
        if have_key:
            out.append(emit(cur, state))
        if out:
            yield pd.DataFrame(out, columns=out_cols)

    return part.mapInPandas(run, out_schema)
