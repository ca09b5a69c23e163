

def test_two_phase_prefix_max_matches_sequential(spark):
    """Exclusive prefix max over a total order == the sequential scan,
    at any range count, including ranges that land empty."""
    import random

    from data_engineering_project_spotify_app_spark.operators.rankutil import (
        two_phase_prefix_max,
    )
    from pyspark.sql import functions as F

    rng = random.Random(7)
    rows = [(i, rng.randint(-50, 50)) for i in range(200)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k int, v int")
    for n_ranges in (1, 3, 8, 64):
        got = {
            r["k"]: r["pm"]
            for r in two_phase_prefix_max(
                df, [F.col("k")], "v", n_ranges, out_col="pm"
            ).collect()
        }
        best = None
        for k, v in sorted(rows):
            assert got[k] == best, (n_ranges, k, got[k], best)
            best = v if best is None else max(best, v)
