"""$asOfJoin (operators/timeseries.py): union-trick as-of join pinned
against handcrafted expectations and DuckDB's native ASOF JOIN."""

import duckdb
from pyspark.sql import functions as F

from pincette_mongo_streams_spark import Context, compile_pipeline


def _frames(spark):
    trades = spark.createDataFrame(
        [(1, "A", 10.0), (3, "A", 11.0), (7, "A", 12.0),
         (2, "B", 20.0), (9, "B", 21.0), (5, "C", 30.0)],
        "t long, sym string, px double",
    )
    quotes = spark.createDataFrame(
        [(0, "A", 9.5), (3, "A", 10.5), (6, "A", 11.5),
         (4, "B", 19.5), (8, "B", 20.5)],
        "t long, sym string, bid double",
    )
    return trades, quotes


def _run(spark, trades, quotes, spec):
    ctx = Context(spark=spark, collections={"q": quotes})
    base = {"from": "q", "on": "sym", "leftTime": "$t", "rightTime": "$t",
            "as": "m"}
    base.update(spec)
    out = compile_pipeline([{"$asOfJoin": base}], ctx)(trades)
    return {
        (r["sym"], r["t"]): (r["m"]["t"], r["m"]["bid"]) if r["m"] else None
        for r in out.collect()
    }


def test_backward_inclusive(spark):
    trades, quotes = _frames(spark)
    got = _run(spark, trades, quotes, {})
    assert got == {
        ("A", 1): (0, 9.5),
        ("A", 3): (3, 10.5),   # inclusive: equal time matches
        ("A", 7): (6, 11.5),
        ("B", 2): None,        # no quote at or before 2
        ("B", 9): (8, 20.5),
        ("C", 5): None,        # key with no right rows at all
    }


def test_backward_strict(spark):
    trades, quotes = _frames(spark)
    got = _run(spark, trades, quotes, {"strict": True})
    assert got[("A", 3)] == (0, 9.5)  # equal time excluded
    assert got[("A", 7)] == (6, 11.5)


def test_forward(spark):
    trades, quotes = _frames(spark)
    got = _run(spark, trades, quotes, {"direction": "forward"})
    assert got == {
        ("A", 1): (3, 10.5),
        ("A", 3): (3, 10.5),   # inclusive
        ("A", 7): None,        # nothing at or after 7
        ("B", 2): (4, 19.5),
        ("B", 9): None,
        ("C", 5): None,
    }


def test_tolerance_and_inner(spark):
    trades, quotes = _frames(spark)
    got = _run(spark, trades, quotes, {"tolerance": 1})
    assert got[("A", 1)] == (0, 9.5)    # gap 1 <= 1
    assert got[("A", 7)] == (6, 11.5)   # gap 1 <= 1


def test_tolerance_bounds(spark):
    trades, quotes = _frames(spark)
    got = _run(spark, trades, quotes, {"tolerance": 0.5})
    assert got[("A", 3)] == (3, 10.5)   # gap 0
    assert got[("A", 1)] is None        # gap 1 > 0.5
    inner = _run(spark, trades, quotes, {"tolerance": 0.5, "inner": True})
    assert None not in inner.values()


def test_matches_duckdb_asof_on_events(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = events.filter(F.col("event_type") == "click")
    views = events.filter(F.col("event_type") == "view")
    ctx = Context(spark=spark, collections={"v": views})
    out = compile_pipeline(
        [{"$asOfJoin": {"from": "v", "on": "user_id", "leftTime": "$ts",
                        "rightTime": "$ts", "as": "m"}},
         {"$project": {"event_id": 1, "m_event": "$m.event_id"}}],
        ctx,
    )(clicks)
    got = sorted((r["event_id"], r["m_event"]) for r in out.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    exp = sorted(con.sql("""
        SELECT l.event_id, r.event_id AS m_event
        FROM (SELECT * FROM events WHERE event_type = 'click') l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """).fetchall())
    assert got == exp


def test_range_join_binned(spark):
    readings = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 25.0), (4, 99.0)], "rid long, v double"
    )
    bands = spark.createDataFrame(
        [(10, 0.0, 10.0), (20, 10.0, 20.0), (30, 4.0, 26.0)],
        "bid long, lo double, hi double",
    )
    ctx = Context(spark=spark, collections={"b": bands})
    out = compile_pipeline(
        [{"$rangeJoin": {"from": "b", "leftValue": "$v", "rightStart": "$lo",
                         "rightEnd": "$hi", "as": "m", "binSize": 7}}],
        ctx,
    )(readings)
    got = sorted((r["rid"], r["m"]["bid"]) for r in out.collect())
    assert got == [(1, 10), (1, 30), (2, 20), (2, 30), (3, 30)]


def test_range_join_preserve_unmatched_and_keys(spark):
    readings = spark.createDataFrame(
        [(1, "x", 5.0), (2, "y", 5.0), (3, "x", 50.0)],
        "rid long, grp string, v double",
    )
    bands = spark.createDataFrame(
        [(10, "x", 0.0, 10.0), (20, "y", 40.0, 60.0)],
        "bid long, grp string, lo double, hi double",
    )
    ctx = Context(spark=spark, collections={"b": bands})
    out = compile_pipeline(
        [{"$rangeJoin": {"from": "b", "on": "grp", "leftValue": "$v",
                         "rightStart": "$lo", "rightEnd": "$hi", "as": "m",
                         "binSize": 8, "preserveUnmatched": True}}],
        ctx,
    )(readings)
    got = sorted(
        (r["rid"], r["m"]["bid"] if r["m"] else None) for r in out.collect()
    )
    # rid 2 is inside a band's range but the band is for grp 'x' only;
    # rid 3 is in grp 'x' but only grp 'y' covers 50
    assert got == [(1, 10), (2, None), (3, None)]


def test_range_join_matches_duckdb_inequality_join(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = events.filter(F.col("event_type") == "click")
    bands = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id",
        (F.col("value") - 5).alias("lo"), (F.col("value") + 5).alias("hi"),
    )
    ctx = Context(spark=spark, collections={"b": bands})
    out = compile_pipeline(
        [{"$rangeJoin": {"from": "b", "on": "user_id", "leftValue": "$value",
                         "rightStart": "$lo", "rightEnd": "$hi", "as": "m",
                         "binSize": 10}},
         {"$project": {"event_id": 1, "m_event": "$m.event_id"}}],
        ctx,
    )(clicks)
    got = sorted((r["event_id"], r["m_event"]) for r in out.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    exp = sorted(con.sql("""
        SELECT l.event_id, r.event_id AS m_event
        FROM (SELECT * FROM events WHERE event_type = 'click') l
        JOIN (SELECT event_id, user_id, value - 5 AS lo, value + 5 AS hi
              FROM events WHERE event_type = 'purchase') r
          ON l.user_id = r.user_id AND l.value BETWEEN r.lo AND r.hi
    """).fetchall())
    assert got == exp
