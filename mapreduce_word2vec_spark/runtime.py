"""Worker-side distribution of this package.

Python UDFs (pandas UDFs, ``applyInPandas`` functions) are pickled
**by reference** to their defining module, so executor Python workers
must be able to ``import mapreduce_word2vec_spark`` — true on a real
cluster only if the package is shipped. :func:`ensure_workers_can_import`
zips the package once and registers it with ``SparkContext.addPyFile``
(the same mechanism ``spark-submit --py-files`` uses), making every
catalog query self-contained no matter where the driver process runs.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_ADDED: set[int] = set()

# DataFrames persisted inside operators (shingle tables, minhash/simhash
# signatures) whose lifetime the operator itself cannot end: the cache
# must live until the CALLER's terminal action runs, which the operator
# never sees. Tracked here so a long-lived session (bench loops, the
# driver's catalog sweep) can release the previous query's caches
# instead of accumulating them until executor-memory LRU pressure
# degrades unrelated queries.
_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` with session-scoped lifecycle: registered for
    release at the start of the next catalog query (or an explicit
    :func:`release_tracked`)."""
    if storage_level is not None:
        df = df.persist(storage_level)
    else:
        df = df.persist()
    _TRACKED.append(df)
    return df


# localCheckpoint stores its data as RDD-level cached blocks that
# DataFrame.unpersist CANNOT reach (it only uncaches CacheManager
# entries), so without explicit release they linger until the JVM
# ContextCleaner happens to GC the RDD — unbounded in practice for a
# long-lived session. Checkpoints made through
# :func:`tracked_local_checkpoint` record the underlying RDD ids and
# are freed deterministically by :func:`release_tracked` (or eagerly
# by :func:`release_checkpoint` for iterative operators that roll
# checkpoints).
_TRACKED_RDDS: list[tuple[object, int]] = []  # (SparkContext, rdd id)
_CKPT_IDS: dict[int, tuple[object, list[int]]] = {}  # id(df) -> (sc, ids)


def tracked_local_checkpoint(df: DataFrame) -> DataFrame:
    """``df.localCheckpoint(eager=True)`` with session-scoped
    lifecycle: the checkpoint's cached RDD blocks are recorded (by the
    persistent-RDD-id delta the eager materialization creates) and
    freed at the next :func:`release_tracked`, exactly like a
    :func:`tracked_persist` cache."""
    sc = df.sparkSession.sparkContext
    before = {int(i) for i in sc._jsc.getPersistentRDDs().keySet()}
    out = df.localCheckpoint(eager=True)
    new_ids = [
        int(i)
        for i in sc._jsc.getPersistentRDDs().keySet()
        if int(i) not in before
    ]
    _TRACKED_RDDS.extend((sc, i) for i in new_ids)
    _CKPT_IDS[id(out)] = (sc, new_ids)
    return out


def release_checkpoint(df: DataFrame) -> None:
    """Eagerly free the RDD blocks behind a
    :func:`tracked_local_checkpoint` frame that an iterative operator
    has rolled past (the next checkpoint materialized, so the previous
    one is unreachable). No-op for frames not checkpointed here."""
    sc_ids = _CKPT_IDS.pop(id(df), None)
    if sc_ids is None:
        return
    sc, ids = sc_ids
    _unpersist_rdd_ids(sc, ids)
    global _TRACKED_RDDS
    _TRACKED_RDDS = [(s, i) for (s, i) in _TRACKED_RDDS if i not in set(ids)]


def _unpersist_rdd_ids(sc, ids) -> None:
    try:
        m = sc._jsc.getPersistentRDDs()
        for rid in ids:
            if m.containsKey(rid):
                m.get(rid).unpersist(False)
    except Exception:
        pass  # session already stopped — nothing to release


def release_tracked() -> None:
    """Unpersist every tracked DataFrame and checkpoint (non-blocking —
    Spark drops the blocks asynchronously; correctness is unaffected
    because unpersisted plans recompute from lineage and checkpoints
    are only released after their consumers' terminal actions ran)."""
    global _TRACKED, _TRACKED_RDDS
    for df in _TRACKED:
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing to release
    _TRACKED = []
    by_sc: dict[int, tuple[object, list[int]]] = {}
    for sc, rid in _TRACKED_RDDS:
        by_sc.setdefault(id(sc), (sc, []))[1].append(rid)
    for sc, ids in by_sc.values():
        _unpersist_rdd_ids(sc, ids)
    _TRACKED_RDDS = []
    _CKPT_IDS.clear()


def ensure_workers_can_import(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _ADDED:
        return
    pkg_dir = Path(__file__).resolve().parent
    zpath = Path(tempfile.gettempdir()) / f"mapreduce_word2vec_spark_{os.getpid()}.zip"
    if not zpath.exists():
        with zipfile.ZipFile(zpath, "w") as z:
            for p in sorted(pkg_dir.rglob("*.py")):
                z.write(p, arcname=str(Path(pkg_dir.name) / p.relative_to(pkg_dir)))
    sc.addPyFile(str(zpath))
    _ADDED.add(key)
