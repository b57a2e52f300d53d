"""As-of join and sessionization edge semantics (operators/temporal.py):
equal-timestamp inclusivity, tie-breaks, unmatched rows, and the
exclusive session end boundary."""

import datetime as dt

from pyspark.sql import functions as F

from linear_kdtree_spark.operators.temporal import as_of_join, sessionize

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_as_of_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(10)), (2, 10, _ts(5)), (3, 10, _ts(0)), (4, 20, _ts(8))],
        "l_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, _ts(5)), (101, 10, _ts(5)), (102, 10, _ts(7)),
         (103, 30, _ts(1))],
        "r_id long, user_id long, ts timestamp",
    )
    out = {r["l_id"]: r["r_r_id"] for r in
           as_of_join(left, right, by="user_id", ts_col="ts",
                      right_cols=["r_id"]).collect()}
    assert out[1] == 102          # latest at-or-before 10min
    assert out[2] == 101          # EQUAL ts is included; tie → max r_id
    assert out[3] is None         # nothing at-or-before 0min
    assert out[4] is None         # key 20 has no right rows at all
    assert len(out) == 4          # left join keeps every left row


def test_sessionize_boundary(spark):
    # gap 10min: events at 0, 9, 18 chain; 28 sits exactly AT the previous
    # end (18+10) and Spark's boundary is INCLUSIVE → still the same
    # session; 39 is strictly past 28+10 → new session
    ev = spark.createDataFrame(
        [(0, 1, _ts(0)), (1, 1, _ts(9)), (2, 1, _ts(18)), (3, 1, _ts(28)),
         (4, 1, _ts(39)), (5, 2, _ts(0))],
        "event_id long, user_id long, ts timestamp",
    )
    rows = sessionize(ev, gap="10 minutes").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r["session_start_us"])
    assert len(u1) == 2
    assert u1[0]["n_events"] == 4 and u1[0]["max_event_id"] == 3
    assert u1[0]["session_end_us"] - u1[0]["session_start_us"] == (28 + 10) * 60_000_000
    assert u1[1]["n_events"] == 1 and u1[1]["min_event_id"] == 4
    assert by_user[2][0]["n_events"] == 1


def test_as_of_join_null_keys_never_match(spark):
    """SQL ASOF semantics (the DuckDB oracle): NULL keys/timestamps never
    join — a window partitioned on the key would otherwise group NULLs
    together and 'match' them (review r5)."""
    left = spark.createDataFrame(
        [(1, None, _ts(10)), (2, 10, _ts(10))],
        "l_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, None, _ts(5)), (101, 10, _ts(5)), (102, 10, None)],
        "r_id long, user_id long, ts timestamp",
    )
    out = {r["l_id"]: r["r_r_id"] for r in
           as_of_join(left, right, by="user_id", ts_col="ts",
                      right_cols=["r_id"]).collect()}
    assert out[1] is None   # null left key: kept, but matches nothing
    assert out[2] == 101    # null-ts right row 102 can never match
    assert len(out) == 2


def test_sessionize_streaming_starts(spark, tmp_path):
    """sessionize on a streaming frame must attach a watermark (Spark
    rejects a streaming session aggregation without one — review r5) and
    produce the same sessions as the batch path."""
    src = str(tmp_path / "sess_events")
    rows = [(i, 10, _ts(3 * i)) for i in range(8)] + \
           [(100 + i, 20, _ts(60 + 40 * i)) for i in range(3)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    df.write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    out = sessionize(stream, gap="10 minutes")
    q = (out.writeStream.format("memory").queryName("sess_test")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["user_id"], r["session_start_us"], r["n_events"])
           for r in spark.sql("SELECT * FROM sess_test").collect()}
    want = {(r["user_id"], r["session_start_us"], r["n_events"])
            for r in sessionize(spark.read.parquet(src), gap="10 minutes").collect()}
    # append mode only emits sessions the final watermark (max ts - gap)
    # has closed; the newest session stays open in state, so the stream
    # yields a subset missing at most that one — identical values on what
    # it does emit
    assert got <= want
    assert len(want) >= 3 and len(got) >= len(want) - 1
