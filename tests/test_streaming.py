"""Structured Streaming tests: file-source stream over the events
fixture, drained with processingTime=0 triggers into memory sinks, and
checked against the batch operators on the same data."""

import numpy as np
import pandas as pd
import pytest

from hdfe_spark.streaming.ops import (
    read_events_stream,
    streaming_grouped_agg,
    streaming_lag_transform,
    streaming_windowed_agg,
)


def _drain(q):
    q.processAllAvailable()
    q.stop()


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_streaming_grouped_agg_matches_batch(spark, sf_dir, events_batch):
    stream = read_events_stream(spark, sf_dir)
    agg = streaming_grouped_agg(stream, "user_id")
    q = (
        agg.writeStream.format("memory")
        .queryName("t_sgagg")
        .outputMode("complete")
        .start()
    )
    _drain(q)
    got = (
        spark.sql("select * from t_sgagg")
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    want = (
        events_batch.toPandas()
        .groupby("user_id")["value"]
        .agg(["mean", "sum", "count"])
        .sort_index()
    )
    np.testing.assert_allclose(got["mean_value"].values, want["mean"].values, rtol=1e-9)
    np.testing.assert_allclose(got["count_value"].values, want["count"].values)


def test_streaming_windowed_agg(spark, sf_dir, events_batch):
    stream = read_events_stream(spark, sf_dir)
    agg = streaming_windowed_agg(stream, "event_type", window="6 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("t_swin")
        .outputMode("append")
        .start()
    )
    _drain(q)
    got = spark.sql("select * from t_swin").toPandas()
    # Append mode only emits windows the watermark has closed; total
    # rows covered by emitted windows must not exceed the batch count
    # and window bounds must align to 6h.
    if len(got):
        spans = (got["window_end"] - got["window_start"]).unique()
        assert all(pd.Timedelta(s) == pd.Timedelta("6 hours") for s in spans)


def test_streaming_lag_matches_batch_lag(spark, sf_dir, events_batch):
    from hdfe_spark.operators.lags import make_lags

    stream = read_events_stream(spark, sf_dir)
    lagged = streaming_lag_transform(stream, max_lag=2)
    q = (
        lagged.writeStream.format("memory")
        .queryName("t_slag")
        .outputMode("append")
        .start()
    )
    _drain(q)
    got = (
        spark.sql("select * from t_slag")
        .toPandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    want_df, _ = make_lags(
        events_batch, n_lags_back=2, n_lags_forward=0,
        outcomes="value", groupby="user_id", order_by="ts",
    )
    want = (
        want_df.select("user_id", "ts", "value", "value_lag_1", "value_lag_2")
        .toPandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    np.testing.assert_allclose(
        got["value_lag_1"].values.astype(float),
        want["value_lag_1"].values.astype(float),
        rtol=1e-12,
        equal_nan=True,
    )
    np.testing.assert_allclose(
        got["value_lag_2"].values.astype(float),
        want["value_lag_2"].values.astype(float),
        rtol=1e-12,
        equal_nan=True,
    )


def test_streaming_dedup_alltime_matches_distinct(spark, sf_dir, events_batch):
    """All-time streaming dedup (within_watermark=False) over a bounded
    replay equals batch DISTINCT on the keys."""
    import uuid

    from hdfe_spark.streaming.ops import streaming_dedup

    stream = read_events_stream(spark, sf_dir)
    ded = streaming_dedup(
        stream, ["user_id", "event_type"], within_watermark=False
    )
    sink = "t_" + uuid.uuid4().hex[:8]
    q = (
        ded.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    _drain(q)
    got = spark.table(sink).select("user_id", "event_type").toPandas()
    want = events_batch.select("user_id", "event_type").distinct().toPandas()
    key = lambda df: sorted(map(tuple, df.to_numpy()))
    assert key(got) == key(want)


def test_streaming_dedup_within_watermark_bounds_state(spark, sf_dir):
    """dropDuplicatesWithinWatermark keeps ONE row per key within the
    watermark horizon (emits each key at least once, never a key that
    does not exist; exact all-time uniqueness is not its contract)."""
    import uuid

    from hdfe_spark.streaming.ops import streaming_dedup

    stream = read_events_stream(spark, sf_dir)
    ded = streaming_dedup(
        stream, ["user_id", "event_type"],
        watermark="1 hour", within_watermark=True,
    )
    sink = "t_" + uuid.uuid4().hex[:8]
    q = (
        ded.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    _drain(q)
    got = spark.table(sink).select("user_id", "event_type").toPandas()
    want = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type").distinct().toPandas()
    )
    got_keys = set(map(tuple, got.to_numpy()))
    want_keys = set(map(tuple, want.to_numpy()))
    assert got_keys == want_keys  # every real key appears, no phantoms
    assert len(got) >= len(want)  # re-emission beyond horizon allowed


def test_streaming_session_window_matches_batch_sessionize(spark, sf_dir):
    """Native streaming session windows equal the batch gap-and-islands
    sessionization: same (entity, session_start, n_events) triples.
    (session_window merges events < gap apart, identical grouping to
    the strictly-greater gap-and-islands rule except AT the boundary,
    which the ns-precision fixture never hits.)"""
    import uuid

    from pyspark.sql import functions as SF

    from hdfe_spark.operators.sessions import session_stats
    from hdfe_spark.streaming.ops import streaming_session_agg

    gap_min = 30
    stream = read_events_stream(spark, sf_dir)  # ts already a timestamp
    agg = streaming_session_agg(
        stream, "user_id", "ts", gap=f"{gap_min} minutes"
    )
    sink = "t_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
    )
    _drain(q)
    got = spark.table(sink).select(
        "user_id",
        SF.unix_micros(SF.col("session_start")).alias("start_us"),
        "n_events",
    ).toPandas()

    from hdfe_spark.sources.tables import ts_micros

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev.withColumn("ts", ts_micros(ev, "ts"))
    want = session_stats(
        ev, "user_id", "ts", gap=gap_min * 60 * 1_000_000
    ).select(
        "user_id",
        SF.col("session_start").alias("start_us"),
        "n_events",
    ).toPandas()

    key = lambda df: sorted(map(tuple, df.to_numpy()))
    assert key(got) == key(want)


def test_driver_queries_bound_sink_leak(spark, sf_dir):
    """The driver-query memory sinks clean up their predecessors: after
    N streaming queries, at most ONE snk_* temp view survives (round-3
    ADVICE — uuid sinks used to accumulate across the 72-query run)."""
    import __spark_entry__ as em

    qs = em.queries()
    for name in ("streaming_agg", "streaming_dedup"):
        qs[name](spark, sf_dir).count()
    leaked = [
        t.name for t in spark.catalog.listTables() if t.name.startswith("snk_")
    ]
    assert len(leaked) <= 1


def test_streaming_static_enrich_matches_batch(spark, sf_dir, events_batch):
    """Stream-static broadcast enrichment equals the batch join."""
    import uuid

    from pyspark.sql import functions as SF

    from hdfe_spark.streaming.ops import streaming_static_enrich

    dim = spark.createDataFrame(
        [("click", "engage"), ("view", "engage"), ("purchase", "convert"),
         ("signup", "convert"), ("error", "ops")],
        "event_type string, category string",
    )
    stream = read_events_stream(spark, sf_dir)
    enr = streaming_static_enrich(stream, dim, "event_type")
    sink = "t_" + uuid.uuid4().hex[:8]
    q = (
        enr.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    _drain(q)
    got = (
        spark.table(sink)
        .groupBy("category")
        .agg(SF.count(SF.lit(1)).alias("n"))
        .toPandas()
        .set_index("category")["n"]
        .to_dict()
    )
    want = (
        events_batch.join(dim, "event_type")
        .groupBy("category")
        .agg(SF.count(SF.lit(1)).alias("n"))
        .toPandas()
        .set_index("category")["n"]
        .to_dict()
    )
    assert got == want


def test_streaming_cms_matches_batch_sketch(spark, sf_dir, events_batch):
    """The stream-folded CMS must equal the batch cms_build table on
    the same rows — the sketch is additive, so micro-batch boundaries
    cannot matter."""
    import uuid

    from hdfe_spark.operators.sketch import cms_build
    from hdfe_spark.streaming.ops import read_events_stream, streaming_cms

    stream = read_events_stream(spark, sf_dir)
    cms = streaming_cms(stream, "event_type", d=4, n_hex=2)
    sink = "t_" + uuid.uuid4().hex[:8]
    q = (
        cms.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.j, r.bucket): r.cnt for r in spark.table(sink).collect()
    }
    want = {
        (r.j, r.bucket): r.cnt
        for r in cms_build(events_batch, "event_type", d=4, n_hex=2).collect()
    }
    assert got == want


def test_streaming_ewma_equals_batch_fold(spark, sf_dir):
    """Thirteenth streaming form: the incremental EWMA state after an
    availableNow replay equals the batch fold exactly (same IEEE op
    sequence in event_id order)."""
    import pyspark.sql.functions as F

    from hdfe_spark.operators.stats import ewma
    from hdfe_spark.sources.tables import load_table
    from hdfe_spark.streaming.ops import read_events_stream, streaming_ewma

    load_table(spark, "events", sf_dir)
    stream = read_events_stream(spark, sf_dir)
    sm = streaming_ewma(stream, "user_id", "event_id", "value", alpha=0.5)
    name = "ewma_stream_test_sink"
    q = (
        sm.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["s"]["n"], r["s"]["ewma"])
        for r in spark.table(name)
        .groupBy("user_id")
        .agg(F.max_by(F.struct("n", "ewma"), "n").alias("s"))
        .collect()
    }
    batch = {
        r["user_id"]: (r["n"], r["ewma"])
        for r in ewma(
            load_table(spark, "events", sf_dir),
            "user_id", "event_id", "value", alpha=0.5,
        ).collect()
    }
    assert got == batch  # bit-exact, not approx


def test_streaming_ewma_multichunk_fold_order(spark, tmp_path):
    """Regression: a key whose micro-batch spans multiple Arrow
    chunks must fold in ONE global order_col sort — per-chunk sorts
    interleave chunks in arrival order and break the batch
    certificate (caught by code review with maxRecordsPerBatch=3)."""
    import pandas as pd
    import pyspark.sql.functions as F

    from hdfe_spark.streaming.ops import streaming_ewma

    src = str(tmp_path / "ewma_chunks")
    # 12 rows, one key, written in REVERSE event order
    rows = [(1, 11 - i, float(v))
            for i, v in enumerate([1, 2, 4, 8, 3, 9, 5, 7, 6, 2, 8, 4])]
    spark.createDataFrame(
        rows, "user_id long, event_id long, value double"
    ).coalesce(1).write.mode("overwrite").parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        stream = spark.readStream.schema(
            "user_id long, event_id long, value double"
        ).parquet(src)
        sm = streaming_ewma(stream, "user_id", "event_id", "value", 0.5)
        name = "ewma_chunk_sink"
        q = (
            sm.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = (
            spark.table(name)
            .orderBy(F.desc("n"))
            .limit(1)
            .collect()[0]
        )
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    # reference: sequential fold in event_id order
    ordered = [v for _, _, v in sorted(rows, key=lambda r: r[1])]
    y = ordered[0]
    for v in ordered[1:]:
        y = 0.5 * v + 0.5 * y
    assert got["n"] == 12 and got["ewma"] == y  # bit-exact


def test_streaming_anomaly_multichunk_order(spark, tmp_path):
    """Fourteenth-form regression guard (the streaming_ewma lesson):
    a key whose micro-batch spans multiple Arrow chunks must process
    in ONE global event_id sort — per-chunk iteration would evaluate
    the prior-stats rule against wrong prefixes."""
    import math

    import pyspark.sql.functions as F

    from hdfe_spark.streaming.ops import streaming_anomaly

    src = str(tmp_path / "anom_chunks")
    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.0, 11.5, 9.0, 10.0,
            10.5, 9.5, 10.0, 55.0, 10.0, 9.5]
    # written in REVERSE event order so arrival != event order
    rows = [(1, len(vals) - 1 - i, v) for i, v in enumerate(vals[::-1])]
    spark.createDataFrame(
        rows, "user_id long, event_id long, value double"
    ).coalesce(1).write.mode("overwrite").parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        stream = spark.readStream.schema(
            "user_id long, event_id long, value double"
        ).parquet(src)
        sm = streaming_anomaly(
            stream, "user_id", "event_id", "value",
            z=3, min_n=5, scale=1e3,
        )
        name = "anom_chunk_sink"
        q = (
            sm.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = (
            spark.table(name)
            .orderBy(F.desc("n"))
            .limit(1)
            .collect()[0]
        )
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    # reference: the exact integer rule in event_id order
    n = s = qq = na = 0
    for v in vals:
        u = int(math.floor(v * 1e3 + 0.5))
        if n >= 5 and (n * u - s) ** 2 > 9 * (n * qq - s * s):
            na += 1
        n, s, qq = n + 1, s + u, qq + u * u
    assert (got["n"], got["n_anomalies"]) == (n, na)
    assert na >= 1  # the planted 55.0 spike is caught


def test_streaming_hll_matches_batch_sketch(spark, sf_dir, events_batch):
    """Seventeenth streaming form: the per-bucket max-rho state after
    an availableNow replay equals the batch sketch's bucket table
    bit-for-bit (HLL merge = MAX, order-free and idempotent), and the
    finalized (m, n_empty, s33, est) row equals hll_distinct's."""
    import uuid

    import pyspark.sql.functions as F

    from hdfe_spark.operators.sketch import (
        _hll_bucket_rho,
        hll_distinct,
        hll_finalize,
    )
    from hdfe_spark.streaming.ops import read_events_stream, streaming_hll

    stream = read_events_stream(spark, sf_dir)
    state = streaming_hll(stream, "user_id", b=8)
    sink = "t_" + uuid.uuid4().hex[:8]
    q = (
        state.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["__bkt"], r["__mx"]) for r in spark.table(sink).collect()}
    bucket, rho = _hll_bucket_rho("user_id", 8)
    want = {
        (r["__bkt"], r["__mx"])
        for r in events_batch.filter(F.col("user_id").isNotNull())
        .select(bucket.alias("__bkt"), rho.alias("__rho"))
        .groupBy("__bkt")
        .agg(F.max("__rho").alias("__mx"))
        .collect()
    }
    assert got == want
    fin = hll_finalize(spark.table(sink), b=8).collect()[0]
    batch = hll_distinct(events_batch, "user_id", b=8).collect()[0]
    for c in ("m", "n_empty", "s33", "est"):
        assert fin[c] == batch[c], c


def test_streaming_rake_matches_batch(spark, sf_dir, tmp_path):
    """Eighteenth streaming form: RAKE's freq/deg are additive, so
    the availableNow fold over arbitrary file boundaries equals the
    batch table exactly, score included."""
    import uuid

    from hdfe_spark.operators.text import rake_keywords
    from hdfe_spark.streaming.ops import streaming_rake

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    src = str(tmp_path / "rake_src")
    # 3 files -> 3 micro-batches with maxFilesPerTrigger=1
    docs.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_rake(stream, "text", min_freq=2)
    sink = "t_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["word"]: (r["freq"], r["deg"], r["score"])
        for r in spark.table(sink).collect()
    }
    want = {
        r["word"]: (r["freq"], r["deg"], r["score"])
        for r in rake_keywords(docs, "text", min_freq=2).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_welch_equals_batch(spark, sf_dir):
    """23rd form: per-segment Welch moments are additive counters,
    so the complete-mode availableNow fold equals batch welch_by
    bit-for-bit."""
    from hdfe_spark.operators.stats import welch_by
    from hdfe_spark.streaming.ops import read_table_stream, streaming_welch

    from pyspark.sql import functions as F

    def base(df):
        return df.select(
            (F.col("user_id") % 10).cast("long").alias("segment"),
            "event_type",
            "value",
        )

    stream = read_table_stream(spark, sf_dir, "events")
    out = streaming_welch(
        base(stream), "segment", "event_type", "value", "click", "view"
    )
    import uuid

    sink = "sw_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["segment"]: tuple(r)
        for r in spark.table(sink).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {
        r["segment"]: tuple(r)
        for r in welch_by(
            base(ev), "segment", "event_type", "value", "click", "view"
        ).collect()
    }
    assert got == want


def test_streaming_did_equals_batch(spark, sf_dir):
    """24th form: the four cell sums (exact DECIMAL) and non-NULL
    outcome counts are additive, so the complete-mode availableNow
    fold equals batch causal.did bit-for-bit."""
    import uuid

    from pyspark.sql import functions as F

    from hdfe_spark.operators.causal import did
    from hdfe_spark.streaming.ops import read_table_stream, streaming_did

    def base(df):
        return df.select(
            F.col("value").cast("decimal(18,6)").alias("y"),
            ((F.col("user_id") % 2) == 0).alias("treat"),
            ((F.col("event_id") % 3) == 0).alias("post"),
        )

    stream = read_table_stream(spark, sf_dir, "events")
    out = streaming_did(base(stream), "y", "treat", "post")
    sink = "sd_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table(sink).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = did(base(ev), "y", "treat", "post").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
