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

from pyspark.sql import SparkSession

_ADDED: set[int] = set()


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
