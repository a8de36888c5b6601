"""hough_votes / hough_lines (geo/hough.py) vs a NumPy accumulator and
planted-line recovery."""

import math

import numpy as np

from morituri_spark.geo.hough import hough_lines, hough_votes, theta_table


def _ref_votes(pts, n_theta, rho_step):
    acc = {}
    tab = theta_table(n_theta)
    for x, y in pts:
        for k, c, s in tab:
            rb = math.floor((x * c + y * s) / rho_step + 0.5)
            acc[(k, rb)] = acc.get((k, rb), 0) + 1
    return acc


def test_votes_match_bruteforce(spark):
    pts = [(float((i * 7) % 53), float((i * 11) % 47)) for i in range(300)]
    df = spark.createDataFrame(pts, "x double, y double")
    got = {
        (r["theta_k"], r["rho_bin"]): r["votes"]
        for r in hough_votes(df, n_theta=8, rho_step=4.0).collect()
    }
    assert got == _ref_votes(pts, 8, 4.0)


def test_planted_horizontal_line_detected(spark):
    # y = 40: votes pile at theta_k = n_theta/2 (theta = pi/2 -> s = 1)
    line = [(float(x), 40.0) for x in range(60)]
    noise = [(float((i * 13) % 97), float((i * 29) % 89)) for i in range(40)]
    df = spark.createDataFrame(line + noise, "x double, y double")
    top = (
        hough_lines(df, n_theta=8, rho_step=4.0, min_votes=30)
        .orderBy("votes", ascending=False)
        .collect()
    )
    assert top, "planted line not detected"
    assert top[0]["theta_k"] == 4  # pi/2
    assert top[0]["rho_bin"] == 10  # floor(40/4 + .5)
    assert top[0]["votes"] >= 60
    assert top[0]["rho_center"] == 40.0


def test_per_image_votes_are_additive(spark):
    # two copies of the same cloud = doubled votes per cell
    pts = [(float(i % 17), float(i % 13)) for i in range(100)]
    one = spark.createDataFrame(pts, "x double, y double")
    two = spark.createDataFrame(pts + pts, "x double, y double")
    v1 = {
        (r["theta_k"], r["rho_bin"]): r["votes"]
        for r in hough_votes(one, n_theta=4).collect()
    }
    v2 = {
        (r["theta_k"], r["rho_bin"]): r["votes"]
        for r in hough_votes(two, n_theta=4).collect()
    }
    assert v2 == {k: 2 * v for k, v in v1.items()}


def test_theta_table_literals_are_6dp(spark):
    for k, c, s in theta_table(16):
        assert c == round(c, 6) and s == round(s, 6)
        assert -1.0 <= c <= 1.0 and 0.0 <= s <= 1.0
