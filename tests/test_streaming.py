"""Structured Streaming tests (SURVEY §5.3 ◇: stream-mode windows).

Strategy: replay the batch fixtures through readStream (availableNow
+ memory sink, synchronous via processAllAvailable) and assert the
streaming result equals the batch result of the SAME transformation —
plus watermark late-data and custom-state behavior that have no batch
analogue."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mapreduce_word2vec_spark.sources.readers import read_testdata
from mapreduce_word2vec_spark.streaming.windows import (
    session_counts_stream,
    stateful_running_counts,
    stream_dedup,
    tumbling_counts,
    watermarked_tumbling,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(spark):
    """Batch events re-written as a parquet directory readStream can
    consume (µs timestamps, so no nanos special-casing in the stream
    path)."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    read_testdata(spark, SF_SMOKE, "events").write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(spark, sdf, name, output_mode="complete"):
    q = (
        sdf.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def _rows(df):
    return sorted([tuple(r) for r in df.collect()], key=repr)


def test_stream_tumbling_equals_batch(spark, events_dir):
    batch = read_testdata(spark, SF_SMOKE, "events")
    schema = batch.schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    got = _run_stream(spark, tumbling_counts(stream), "t_tumbling")
    assert _rows(got) == _rows(tumbling_counts(batch))


def test_stream_session_window_equals_batch_sessionization(spark, events_dir):
    """Native session_window (stream) produces the same sessions as
    the batch lag/cumsum formulation: compare (user, start, end, n)."""
    from mapreduce_word2vec_spark.streaming.windows import session_counts_batch

    batch = read_testdata(spark, SF_SMOKE, "events")
    schema = batch.schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    got = _run_stream(spark, session_counts_stream(stream, "30 minutes"), "t_session")
    # FULL-row comparison including session_end: the stream form
    # subtracts the gap back out of session_window.end so both forms
    # mean "last event time" (a gap-extended end silently diverged
    # here before and only a column-dropping comparison hid it).
    cols = ["user_id", "session_start", "session_end", "n_events", "sum_value"]
    assert _rows(got.select(*cols)) == _rows(
        session_counts_batch(batch, 30).select(*cols)
    )


def test_watermark_drops_late_data(spark):
    """Two micro-batches: the second contains an event 1h older than
    the watermark → its window never appears in append output."""
    d = tempfile.mkdtemp(prefix="late_")
    try:
        base = read_testdata(spark, SF_SMOKE, "events").where(F.col("event_id") < 200)
        on_time = base.where(F.col("event_id") < 190)
        max_ts = base.agg(F.max("ts")).collect()[0][0]
        late = (
            base.where(F.col("event_id") >= 190)
            .withColumn("ts", F.expr("ts - INTERVAL 5 HOURS"))
        )
        on_time.coalesce(1).write.parquet(f"{d}/f0")
        late.coalesce(1).write.parquet(f"{d}/f1")

        schema = base.schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/f*")
        )
        agg = watermarked_tumbling(stream, "5 minutes", "10 minutes")
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_late")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        out = spark.sql("SELECT * FROM t_late")
        late_windows = {r["window_start"] for r in out.collect()}
        late_min = late.agg(F.min("ts")).collect()[0][0]
        # No emitted window may cover the shifted-late region if it
        # arrived after the watermark passed it.
        assert all(w > late_min or w <= max_ts for w in late_windows)
        # Append mode only emits windows finalized by the watermark.
        assert all(r["n"] >= 1 for r in out.collect())
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_dedup_within_watermark(spark):
    """Duplicate event_ids across micro-batches are emitted once."""
    d = tempfile.mkdtemp(prefix="dedup_")
    try:
        base = read_testdata(spark, SF_SMOKE, "events").where(F.col("event_id") < 50)
        base.coalesce(1).write.parquet(f"{d}/f0")
        base.coalesce(1).write.parquet(f"{d}/f1")  # exact duplicates
        schema = base.schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/f*")
        )
        q = (
            stream_dedup(stream, "10 minutes")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("t_dedup")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        out = spark.sql("SELECT event_id, count(*) c FROM t_dedup GROUP BY event_id")
        assert out.where(F.col("c") > 1).count() == 0
        assert out.count() == 50
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stateful_running_counts(spark, events_dir):
    """applyInPandasWithState totals equal batch groupBy counts after
    the full replay."""
    batch = read_testdata(spark, SF_SMOKE, "events")
    schema = batch.schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    got = _run_stream(
        spark, stateful_running_counts(stream), "t_state", output_mode="update"
    )
    # update mode may emit per micro-batch; take the max per key.
    final = {
        r["event_type"]: r["mx"]
        for r in got.groupBy("event_type").agg(F.max("total").alias("mx")).collect()
    }
    expected = {
        r["event_type"]: r["n"]
        for r in batch.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert final == expected


def test_stream_stream_interval_join_equals_batch(spark, events_dir):
    """Watermarked stream-stream interval join (append mode) emits
    exactly the batch interval-join result once all data is replayed."""
    from mapreduce_word2vec_spark.streaming.windows import (
        click_purchase_interval_join,
    )

    batch = read_testdata(spark, SF_SMOKE, "events")
    schema = batch.schema
    s1 = spark.readStream.schema(schema).parquet(events_dir)
    s2 = spark.readStream.schema(schema).parquet(events_dir)
    joined = click_purchase_interval_join(
        s1.where(F.col("event_type") == "click").withWatermark("ts", "2 hours"),
        s2.where(F.col("event_type") == "purchase").withWatermark("ts", "2 hours"),
    )
    got = _run_stream(spark, joined, "t_interval_join", output_mode="append")
    expected = click_purchase_interval_join(
        batch.where(F.col("event_type") == "click"),
        batch.where(F.col("event_type") == "purchase"),
    )
    assert _rows(got) == _rows(expected)


def test_watermark_bounds_state_size(spark):
    """Scale evidence for streaming state: the watermark must EVICT
    window state as event time advances, not only gate late rows. We
    replay the corpus as time-ordered micro-batches and assert (a)
    state rows were actually removed while the stream ran and (b) the
    final state size is a small fraction of all windows ever created —
    i.e. state is bounded by the watermark horizon, not by stream
    length, which is what keeps a 100 TB/day stream's state store from
    growing without bound."""
    d = tempfile.mkdtemp(prefix="state_")
    try:
        from pyspark.sql import Window

        base = read_testdata(spark, SF_SMOKE, "events")
        chunked = base.withColumn(
            "_chunk",
            F.ntile(6).over(Window.orderBy("ts")),
        )
        for i in range(1, 7):
            chunked.where(F.col("_chunk") == i).drop("_chunk").coalesce(1).write.parquet(
                f"{d}/f{i}"
            )
        schema = base.schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/f*")
        )
        agg = watermarked_tumbling(stream, "5 minutes", "10 minutes")
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_state_bound")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        progresses = [p for p in q.recentProgress if p.get("stateOperators")]
        q.stop()
        assert progresses, "no state operator progress recorded"
        removed = sum(
            p["stateOperators"][0].get("numRowsRemoved", 0) for p in progresses
        )
        final_state = progresses[-1]["stateOperators"][0]["numRowsTotal"]
        emitted = spark.sql("SELECT count(*) FROM t_state_bound").collect()[0][0]
        assert removed > 0, "watermark never evicted state"
        # All finalized windows left the store: what remains is only
        # the unfinalized tail above the final watermark.
        assert final_state < emitted, (final_state, emitted)
        assert final_state + removed >= emitted, (final_state, removed, emitted)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stateful_keep_last_equals_batch_compaction(spark, events_dir):
    """Stream-mode CDC compaction (applyInPandasWithState keep-last)
    converges to the batch events_compact_last result after the full
    replay: for every (user, type) the final state emission carries
    the same latest event id."""
    from mapreduce_word2vec_spark.plans import catalog
    from mapreduce_word2vec_spark.streaming.windows import stateful_keep_last

    batch = read_testdata(spark, SF_SMOKE, "events")
    schema = batch.schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    got = _run_stream(spark, stateful_keep_last(stream), "t_keep_last",
                      output_mode="update")
    # update mode emits once per key per micro-batch; the final value
    # per key is the emission with the max (ts, id).
    w_cols = ["user_id", "event_type"]
    final = (
        got.groupBy(*w_cols)
        .agg(F.max_by(
            "last_event_id", F.struct("last_ts_micros", "last_event_id")
        ).alias("last_event_id"))
    )
    expected = catalog.queries()["events_compact_last"](spark, SF_SMOKE).select(
        *w_cols, "last_event_id"
    )
    assert _rows(final) == _rows(expected)


def test_stream_trending_topk_foreachbatch_equals_batch(spark, events_dir):
    """Trending top-k in stream mode: the windowed counts stream into
    foreachBatch, where the per-window rank runs as a plain batch
    window over the (complete-mode) aggregate — ranks over finalized
    aggregates equal the batch query's."""
    from pyspark.sql import Window as W

    batch = read_testdata(spark, SF_SMOKE, "events")
    stream = spark.readStream.schema(batch.schema).parquet(events_dir)

    collected = []

    def rank_batch(df, _epoch):
        rnk = F.row_number().over(
            W.partitionBy("window_start").orderBy(F.desc("n"), "event_type")
        )
        collected.append(
            df.select("window_start", "event_type", "n", rnk.alias("rnk"))
            .where(F.col("rnk") <= 3)
            .collect()
        )

    q = (
        tumbling_counts(stream)
        .select("window_start", "event_type", "n")
        .writeStream.outputMode("complete")
        .foreachBatch(rank_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    from mapreduce_word2vec_spark.plans import catalog

    want = catalog.queries()["stream_topk_trending"](spark, SF_SMOKE).select(
        "window_start", "event_type", "n"
    )
    got_last = [(r.window_start, r.event_type, r.n) for r in collected[-1]]
    assert sorted(got_last, key=repr) == _rows(want)


def test_transform_with_state_running_counts(spark):
    """transformWithStateInPandas (Spark 4 StatefulProcessor) running
    counts equal the batch groupBy — skipped where the python
    protobuf package (the API's state-server protocol dependency) is
    not installed; applyInPandasWithState covers the same semantics
    unconditionally (test_stateful_running_counts)."""
    import pytest

    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError:
        pytest.skip("python protobuf not available in this environment")

    import shutil
    import tempfile

    from mapreduce_word2vec_spark.sources.readers import read_testdata
    from mapreduce_word2vec_spark.streaming.windows import (
        stateful_running_counts_tws,
    )
    from tests.conftest import SF_SMOKE

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    d = tempfile.mkdtemp(prefix="tws_")
    try:
        base = read_testdata(spark, SF_SMOKE, "events")
        base.write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(base.schema).parquet(d)
        q = (
            stateful_running_counts_tws(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("t_tws")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = {
            r["event_type"]: r["total"]
            for r in spark.sql("SELECT * FROM t_tws").collect()
        }
        want = {
            r["event_type"]: r["count"]
            for r in base.groupBy("event_type").count().collect()
        }
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stateful_cep_equals_batch_pattern_counts(spark, events_dir):
    """Streaming CEP (buffered state machine) converges to the batch
    events_cep_pattern counts once the full corpus is replayed: for
    every user the final emission (max n_seen) carries the same
    conversion count."""
    from mapreduce_word2vec_spark.plans import catalog
    from mapreduce_word2vec_spark.streaming.windows import stateful_cep_counts

    batch = read_testdata(spark, SF_SMOKE, "events")
    stream = spark.readStream.schema(batch.schema).parquet(events_dir)
    got = _run_stream(spark, stateful_cep_counts(stream), "t_cep",
                      output_mode="update")
    final = got.groupBy("user_id").agg(
        F.max_by("n_conversions", "n_seen").alias("n_conversions"),
        F.max("n_seen").alias("seq_len"),
    )
    expected = catalog.queries()["events_cep_pattern"](spark, SF_SMOKE).select(
        "user_id", "n_conversions", "seq_len"
    )
    assert _rows(final.select("user_id", "n_conversions", "seq_len")) == _rows(expected)


def test_cep_dfa_fold_equals_regex():
    """The DFA fold behind the bounded CEP operator must count exactly
    like ``len(re.findall(CEP_PATTERN, s))`` (non-overlapping leftmost)
    for arbitrary symbol strings — including symbols outside the
    alphabet and the excluded symbol in every position. The fold is
    what lets a watermark-evicted prefix collapse to constant state, so
    its equivalence IS the bounded operator's correctness argument."""
    import random
    import re

    from mapreduce_word2vec_spark.streaming.windows import (
        CEP_PATTERN,
        cep_dfa_fold,
    )

    pat = re.compile(CEP_PATTERN)
    rng = random.Random(42)
    alphabet = "vcspe"
    for trial in range(500):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        count, _ = cep_dfa_fold(0, 0, s)
        assert count == len(pat.findall(s)), s
        # split anywhere: folding the prefix then continuing through
        # the suffix must give the same count (the eviction contract)
        if s:
            k = rng.randrange(0, len(s))
            c1, st = cep_dfa_fold(0, 0, s[:k])
            c2, _ = cep_dfa_fold(c1, st, s[k:])
            assert c2 == len(pat.findall(s)), (s, k)


def test_stateful_cep_bounded_equals_batch_and_evicts(spark):
    """The watermark-evicting CEP twin must (a) produce the exact
    batch events_cep_pattern answer when replay arrives in event-time
    order, and (b) actually advance the event-time watermark past the
    earliest events (so eviction ran — the test is not vacuous)."""
    import glob
    import os
    import tempfile
    import time

    from mapreduce_word2vec_spark.plans import catalog
    from mapreduce_word2vec_spark.streaming.windows import (
        stateful_cep_counts_bounded,
    )

    batch = read_testdata(spark, SF_SMOKE, "events")
    base = tempfile.mkdtemp(prefix="t_cepb_")
    src = os.path.join(base, "src")
    (
        batch.repartitionByRange(6, "ts")
        .sortWithinPartitions("ts", "event_id")
        .write.mode("overwrite")
        .parquet(src)
    )
    t0 = time.time()
    for i, f in enumerate(sorted(glob.glob(os.path.join(src, "part-*")))):
        os.utime(f, (t0 + i, t0 + i))
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(src)
        .withWatermark("ts", "1 hour")
    )
    q = (
        stateful_cep_counts_bounded(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_cep_bounded")
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    watermarks = [
        p["eventTime"]["watermark"]
        for p in q.recentProgress
        if p.get("eventTime", {}).get("watermark")
    ]
    q.stop()
    # (b) the watermark advanced beyond epoch zero → later batches
    # folded + evicted sub-horizon symbols instead of buffering forever
    assert watermarks and max(watermarks) > "1971", watermarks
    final = spark.table("t_cep_bounded").groupBy("user_id").agg(
        F.max_by("n_conversions", "n_seen").alias("n_conversions"),
        F.max("n_seen").alias("seq_len"),
    )
    expected = catalog.queries()["events_cep_pattern"](spark, SF_SMOKE).select(
        "user_id", "n_conversions", "seq_len"
    )
    assert _rows(final.select("user_id", "n_conversions", "seq_len")) == _rows(expected)
    shutil.rmtree(base, ignore_errors=True)
