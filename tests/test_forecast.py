"""Pre-flight join forecasting (plans/forecast.py)."""

from pyspark.sql import functions as F

from anomaly_detector_spark.plans.forecast import (
    forecast_equijoin,
    forecast_join_tables,
    join_profile,
)


def _side(spark, hot_n, uniform_keys, uniform_cnt, hot="HOT"):
    hot_df = spark.range(hot_n).select(F.lit(hot).alias("key"))
    uni = spark.range(uniform_keys * uniform_cnt).select(
        F.concat(F.lit("k"), (F.col("id") % uniform_keys).cast("string")).alias("key")
    )
    return hot_df.unionByName(uni)


def test_skewed_join_forecast_accuracy_and_skew(spark):
    # A: HOT x5000 + 1000 uniform keys x2; B: HOT x300 + 500 of those x1.
    # True output = 5000*300 + 500*2 = 1_501_000, ~99.9% from one key.
    a = _side(spark, 5000, 1000, 2)
    b = _side(spark, 300, 500, 1)
    true = a.join(b, "key").count()
    assert true == 1_501_000

    fc = forecast_join_tables(a, b, ["key"], k=64, broadcast_rows=10).collect()[0]
    assert fc["n_a"] == 7000 and fc["d_a"] == 1001
    assert fc["n_b"] == 800 and fc["d_b"] == 501
    # the hot pair is matched heavy-to-heavy: exact and a SOUND lower bound
    assert fc["max_key"] == "HOT" and fc["max_key_rows"] == 1_500_000
    assert fc["lower_rows"] <= true
    assert abs(fc["est_rows"] - true) / true < 0.05
    assert fc["skew_share"] > 0.9
    assert fc["strategy"] == "salt"  # too big to broadcast, one dominant key

    # with the default broadcast threshold the small side wins instead
    # smaller side is b (800): broadcast_a only wins when n_a <= n_b
    fc2 = forecast_join_tables(a, b, ["key"], k=64).collect()[0]
    assert fc2["strategy"] == "broadcast_b"


def test_uniform_join_forecast_is_exact(spark):
    # uniform tails: System-R residual is exact when both sides are flat.
    # A: keys 0..99 x3, B: keys 0..99 x2 -> true = 100*6 = 600
    a = spark.range(300).select(
        F.concat(F.lit("k"), (F.col("id") % 100).cast("string")).alias("key")
    )
    b = spark.range(200).select(
        F.concat(F.lit("k"), (F.col("id") % 100).cast("string")).alias("key")
    )
    fc = forecast_join_tables(a, b, ["key"], k=64).collect()[0]
    assert fc["est_rows"] == 600.0
    assert fc["n_heavy_matched"] == 64 and fc["exact_heavy_rows"] == 384


def test_null_keys_excluded_and_disjoint_sides(spark):
    a = spark.createDataFrame(
        [("x",), ("x",), (None,), (None,)], "key string"
    )
    b = spark.createDataFrame([("y",), (None,)], "key string")
    pa, pb = join_profile(a, ["key"]), join_profile(b, ["key"])
    fc = forecast_equijoin(pa, pb).collect()[0]
    # NULLs never match an equi-join: profiles must not count them
    assert fc["n_a"] == 2 and fc["d_a"] == 1 and fc["n_b"] == 1
    assert fc["n_heavy_matched"] == 0 and fc["lower_rows"] == 0
    # disjoint key sets: residual still estimates (uniform assumption),
    # but the sound lower bound is 0
    assert fc["est_rows"] >= 0.0


def test_profile_bound_is_rank_k_plus_one(spark):
    # 5 keys with counts 5,4,3,2,1; k=3 -> bound = count at rank 4 = 2
    rows = [(f"k{i}",) for i in range(5) for _ in range(5 - i)]
    df = spark.createDataFrame(rows, "key string")
    prof = join_profile(df, ["key"], k=3)
    got = prof.select("item", "n", "bound", "n_rows", "n_distinct").collect()
    assert len(got) == 3 and all(r["bound"] == 2 for r in got)
    assert {r["item"]: r["n"] for r in got} == {"k0": 5, "k1": 4, "k2": 3}
    assert got[0]["n_rows"] == 15 and got[0]["n_distinct"] == 5
    # below-k side: bound 0
    tiny = join_profile(df.filter(F.col("key") == "k0"), ["key"], k=3)
    assert tiny.collect()[0]["bound"] == 0
