"""Round-9 optimization parity tests.

Every r9 optimization is value-preserving by construction; this pins
the one internal whose equivalence is arithmetic rather than
structural: the min_by-based argmin rewrites (PQ coding, SemDeDup
assignment) replacing row_number windows.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F




@pytest.fixture(scope="module")
def spark():
    from mapreduce_word2vec_spark.session import get_spark

    return get_spark(
        app_name="test-round9-opt",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def test_minby_argmin_equals_window_argmin(spark):
    """min_by(payload, struct(dist, id)) must reproduce the
    row_number-over-(dist, id) window argmin including tie-breaks."""
    from pyspark.sql import Window

    rng = random.Random(7)
    rows = [
        (v, c, float(rng.choice([0.25, 0.5, 0.5, 1.0, 2.0])))
        for v in range(200)
        for c in range(8)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "cid", "sqd"])
    w = Window.partitionBy("vec_id").orderBy(F.asc("sqd"), F.asc("cid"))
    via_window = {
        (r.vec_id, r.cid)
        for r in df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "cid")
        .collect()
    }
    via_minby = {
        (r.vec_id, r.cid)
        for r in df.groupBy("vec_id")
        .agg(F.min_by("cid", F.struct("sqd", "cid")).alias("cid"))
        .collect()
    }
    assert via_window == via_minby
