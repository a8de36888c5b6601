"""skyline_2d (operators/skyline.py) vs a brute-force dominance filter."""

import pytest

from morituri_spark.operators.skyline import skyline_2d


def _ref(rows):
    def dominated(p):
        return any(
            q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            for q in rows
        )

    return sorted(p for p in rows if not dominated(p))


def _run(spark, rows, width):
    df = spark.createDataFrame(
        [(x, y, i) for i, (x, y) in enumerate(rows)], "x long, y long, i long"
    )
    got = skyline_2d(df, "x", "y", bucket_width=width).collect()
    return sorted((r["x"], r["y"]) for r in got)


CASES = [
    # modular scatter with duplicates and x-ties
    [((i * 7) % 50, (i * 13) % 40) for i in range(200)],
    # strictly ascending staircase: every point on the front
    [(i, i) for i in range(20)],
    # strictly descending: every point dominated except the first x
    [(i, -i) for i in range(20)],
    # exact duplicates of a frontier point both survive
    [(0, 10), (0, 10), (1, 5), (2, 20)],
]


@pytest.mark.parametrize("width", [1, 3, 1024])
@pytest.mark.parametrize("rows", CASES, ids=["modular", "asc", "desc", "dups"])
def test_skyline_matches_bruteforce(spark, rows, width):
    assert _run(spark, rows, width) == _ref(rows)


def test_skyline_keeps_all_columns(spark):
    df = spark.createDataFrame(
        [(1, 2, "a"), (2, 3, "b"), (3, 1, "c")], "x long, y long, tag string"
    )
    got = {r["tag"]: (r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect()}
    assert got == {"a": (1, 2), "b": (2, 3)}


def test_skyline_duplicate_frontier_rows_survive(spark):
    rows = [(0, 10), (0, 10), (1, 5)]
    assert _run(spark, rows, 4) == [(0, 10), (0, 10)]


def test_skyline_width_guard(spark):
    df = spark.createDataFrame([(1, 1)], "x long, y long")
    with pytest.raises(ValueError):
        skyline_2d(df, "x", "y", bucket_width=0)
