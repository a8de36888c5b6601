"""Spearman stats, Cohen's kappa, scene cuts — vs loop references."""

import numpy as np
import pandas as pd

from morituri_spark.ml.rankstats import cohen_kappa_stats, spearman_stats
from morituri_spark.multimodal.video import scene_cuts


def test_spearman_loop_reference(spark):
    rng = np.random.default_rng(11)
    rows = []
    for g in range(6):
        for i in range(50):
            rows.append((g, i, int(rng.integers(0, 1000)), int(rng.integers(0, 1000))))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "id", "x", "y"]))
    got = {r.g: (r.n, r.sum_d2) for r in spearman_stats(df, "g", "x", "y", "id").collect()}
    for g in range(6):
        grp = [r for r in rows if r[0] == g]
        rx = {r[1]: k + 1 for k, r in enumerate(sorted(grp, key=lambda r: (r[2], r[1])))}
        ry = {r[1]: k + 1 for k, r in enumerate(sorted(grp, key=lambda r: (r[3], r[1])))}
        sd2 = sum((rx[r[1]] - ry[r[1]]) ** 2 for r in grp)
        assert got[g] == (50, sd2), g


def test_spearman_perfect_and_reversed(spark):
    rows = [(0, i, i, i * 2) for i in range(20)] + [(1, i, i, -i) for i in range(20)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "id", "x", "y"]))
    got = {r.g: r.sum_d2 for r in spearman_stats(df, "g", "x", "y", "id").collect()}
    n = 20
    assert got[0] == 0                       # rho = 1
    assert got[1] == n * (n * n - 1) // 3    # rho = -1


def test_cohen_kappa_loop_reference(spark):
    rng = np.random.default_rng(31)
    rows = [
        (int(rng.integers(0, 3)), int(rng.integers(0, 5)), int(rng.integers(0, 5)))
        for _ in range(600)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "a", "b"]))
    got = {r.g: (r.n, r.agree, r.pe_num) for r in cohen_kappa_stats(df, "g", "a", "b").collect()}
    for g in range(3):
        grp = [r for r in rows if r[0] == g]
        n = len(grp)
        agree = sum(1 for r in grp if r[1] == r[2])
        pe = sum(
            sum(1 for r in grp if r[1] == c) * sum(1 for r in grp if r[2] == c)
            for c in range(5)
        )
        assert got[g] == (n, agree, pe), g


def test_cohen_kappa_perfect(spark):
    rows = [(0, i % 4, i % 4) for i in range(40)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "a", "b"]))
    r = cohen_kappa_stats(df, "g", "a", "b").collect()[0]
    # kappa = (agree*n - pe)/(n^2 - pe) = 1 when agree == n
    assert r.agree == r.n == 40
    assert (r.agree * r.n - r.pe_num) == (r.n * r.n - r.pe_num) * 1


def test_scene_cuts(spark):
    # 3 videos, 20 frames, 8 bins; distribution jumps every 7 frames
    rows = []
    for v in range(3):
        for f in range(20):
            for b in range(8):
                rows.append(
                    (f"vid{v}", f, b, (v + b * 3 + f * 5 + (f // 7) * 100) % 200)
                )
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["video_id", "frame", "bin", "cnt"]))
    # reference
    want = {}
    for v in range(3):
        scene = 0
        prev = None
        for f in range(20):
            h = [(v + b * 3 + f * 5 + (f // 7) * 100) % 200 for b in range(8)]
            d = sum(abs(a - c) for a, c in zip(h, prev)) if prev is not None else None
            cut = d is not None and d > 300
            if cut:
                scene += 1
            want[(f"vid{v}", f)] = (d, cut, scene)
            prev = h
    got = {
        (r.video_id, r.frame): (r.dist_prev, r.is_cut, r.scene_id)
        for r in scene_cuts(df, cut_thr=300).collect()
    }
    assert got == want
    # the (f // 7) jumps make at least one multi-scene video
    assert max(s for (_, _, s) in got.values()) >= 1


def test_retrieval_ranks(spark):
    from morituri_spark.ml.rankstats import retrieval_ranks

    rng = np.random.default_rng(41)
    rows = []
    for q in range(30):
        for c in range(20):
            rows.append(
                (q, c, int(rng.integers(0, 1000)), bool(rng.integers(0, 4) == 0))
            )
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["query_id", "cand_id", "score", "is_rel"])
    )
    got = {
        r.query_id: (r.n_cands, r.n_rel, r.first_rel_rank,
                     r.rel_in_top1, r.rel_in_top5, r.rel_in_top10)
        for r in retrieval_ranks(df).collect()
    }
    for q in range(30):
        grp = sorted(
            (r for r in rows if r[0] == q), key=lambda r: (-r[2], r[1])
        )
        ranks = [k + 1 for k, r in enumerate(grp) if r[3]]
        first = min(ranks) if ranks else None
        want = (
            20, len(ranks), first,
            int(bool(ranks and first <= 1)),
            int(bool(ranks and first <= 5)),
            int(bool(ranks and first <= 10)),
        )
        assert got[q] == want, q


def test_kfold_assign_balance(spark):
    from morituri_spark.text.sampling import kfold_assign

    rows = [(i % 7, i) for i in range(700)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["stratum", "id"]))
    got = kfold_assign(df, 5).collect()
    from collections import Counter

    per = Counter((r.stratum, r.fold) for r in got)
    # 100 rows per stratum across 5 folds: exactly 20 each
    assert all(per[(s, f)] == 20 for s in range(7) for f in range(5))
    # deterministic: rerun produces identical assignment
    again = {(r.stratum, r.id): r.fold for r in kfold_assign(df, 5).collect()}
    assert all(again[(r.stratum, r.id)] == r.fold for r in got)
    # shuffled: fold is not simply id % 5
    assert any(again[(i % 7, i)] != (i // 7) % 5 for i in range(700))


def test_roc_auc_loop_reference(spark):
    from morituri_spark.ml.rankstats import roc_auc_stats

    rng = np.random.default_rng(23)
    rows = []
    for g in range(5):
        for i in range(120):
            y = int(rng.integers(0, 2))
            # positives shifted up so AUC is meaningfully > 0.5, with
            # heavy ties (scores quantized to 12 levels)
            s = int(rng.integers(0, 12)) + 3 * y
            rows.append((g, s, y))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "s", "y"]))
    got = {
        r.g: (r.n_pos, r.n_neg, r.auc_num2)
        for r in roc_auc_stats(df, "g", "s", "y").collect()
    }
    for g in range(5):
        pos = [r[1] for r in rows if r[0] == g and r[2] == 1]
        neg = [r[1] for r in rows if r[0] == g and r[2] == 0]
        num2 = sum(
            2 if p > n else (1 if p == n else 0) for p in pos for n in neg
        )
        assert got[g] == (len(pos), len(neg), num2), g
        auc = num2 / (2 * len(pos) * len(neg))
        assert 0.5 < auc <= 1.0


def test_roc_auc_degenerate_groups(spark):
    from morituri_spark.ml.rankstats import roc_auc_stats

    rows = [("all_pos", 5, 1), ("all_pos", 7, 1), ("all_neg", 3, 0)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "s", "y"]))
    got = {
        r.g: (r.n_pos, r.n_neg, r.auc_num2)
        for r in roc_auc_stats(df, "g", "s", "y").collect()
    }
    assert got == {"all_pos": (2, 0, 0), "all_neg": (0, 1, 0)}


def test_roc_auc_perfect_separation(spark):
    from morituri_spark.ml.rankstats import roc_auc_stats

    rows = [("g", s, 0) for s in range(10)] + [
        ("g", s, 1) for s in range(10, 20)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "s", "y"]))
    r = roc_auc_stats(df, "g", "s", "y").collect()[0]
    assert (r.n_pos, r.n_neg) == (10, 10)
    assert r.auc_num2 == 2 * 10 * 10  # AUC exactly 1.0


def test_calibration_bins_loop_reference(spark):
    from morituri_spark.ml.rankstats import calibration_bins

    rng = np.random.default_rng(31)
    rows = []
    for g in range(4):
        for i in range(200):
            c = int(rng.integers(0, 1001))  # includes the 1000 edge
            y = int(rng.random() * 1000 < c)
            rows.append((g, c, y))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "c", "y"]))
    got = {
        (r.g, r.bin): (r.n, r.n_pos, r.sum_conf, r.gap_num)
        for r in calibration_bins(df, "g", "c", "y", n_bins=10).collect()
    }
    want = {}
    for g, c, y in rows:
        b = min(c * 10 // 1000, 9)
        n, np_, sc, _ = want.get((g, b), (0, 0, 0, 0))
        want[(g, b)] = (n + 1, np_ + y, sc + c, 0)
    want = {
        k: (n, np_, sc, abs(1000 * np_ - sc))
        for k, (n, np_, sc, _) in want.items()
    }
    assert got == want
    # ECE identity: sum(gap_num) / (1000 * N) == sum over bins of
    # (n_b / N) * |acc_b - conf_b|
    for g in range(4):
        bins = [v for k, v in want.items() if k[0] == g]
        N = sum(b[0] for b in bins)
        ece_exact = sum(b[3] for b in bins) / (1000 * N)
        ece_float = sum(
            (n / N) * abs(np_ / n - sc / (1000 * n))
            for n, np_, sc, _ in bins
        )
        assert abs(ece_exact - ece_float) < 1e-12


def test_calibration_right_edge_folds_into_last_bin(spark):
    from morituri_spark.ml.rankstats import calibration_bins

    rows = [("g", 1000, 1), ("g", 999, 1), ("g", 0, 0), ("g", 100, 0)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "c", "y"]))
    got = {r.bin: (r.n, r.n_pos, r.sum_conf) for r in calibration_bins(
        df, "g", "c", "y").collect()}
    assert got == {9: (2, 2, 1999), 0: (1, 0, 0), 1: (1, 0, 100)}


def test_brier_loop_reference(spark):
    from morituri_spark.ml.rankstats import brier_stats

    rng = np.random.default_rng(53)
    rows = [
        (g, int(rng.integers(0, 1001)), int(rng.integers(0, 2)))
        for g in range(4)
        for _ in range(150)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "c", "y"]))
    got = {r.g: (r.n, r.brier_num) for r in brier_stats(df, "g", "c", "y").collect()}
    for g in range(4):
        grp = [(c, y) for gg, c, y in rows if gg == g]
        num = sum((1000 * y - c) ** 2 for c, y in grp)
        assert got[g] == (len(grp), num), g
        assert 0.0 <= num / (len(grp) * 1000**2) <= 1.0


def test_pr_curve_loop_reference(spark):
    from morituri_spark.ml.rankstats import pr_curve_points

    rng = np.random.default_rng(71)
    rows = []
    for g in range(4):
        for _ in range(150):
            y = int(rng.integers(0, 2))
            rows.append((g, int(rng.integers(0, 15)) + 4 * y, y))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "s", "y"]))
    got = {(r.g, r.s): (r.tp, r.fp) for r in pr_curve_points(df, "g", "s", "y").collect()}
    for g in range(4):
        grp = [(s, y) for gg, s, y in rows if gg == g]
        for lvl in sorted({s for s, _ in grp}):
            tp = sum(1 for s, y in grp if s >= lvl and y == 1)
            fp = sum(1 for s, y in grp if s >= lvl and y == 0)
            assert got[(g, lvl)] == (tp, fp), (g, lvl)
    # one row per distinct (g, score)
    assert len(got) == len({(g, s) for g, s, _ in rows})


def test_ndcg_loop_reference(spark):
    import math

    from morituri_spark.ml.rankstats import ndcg_stats

    rng = np.random.default_rng(131)
    rows = []
    for q in range(8):
        for c in range(15):
            rows.append((q, c, int(rng.integers(0, 100)), int(rng.integers(0, 4))))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["query_id", "cand_id", "score", "rel"])
    )
    got = {r.query_id: (r.n_cands, r.dcg_micro, r.idcg_micro)
           for r in ndcg_stats(df, k=10).collect()}
    disc = [int(math.floor(1_000_000 / math.log2(i + 1))) for i in range(1, 11)]

    def d(rank):
        return disc[rank - 1] if rank <= 10 else 0

    for q in range(8):
        grp = [(c, s, r) for qq, c, s, r in rows if qq == q]
        by_score = sorted(grp, key=lambda t: (-t[1], t[0]))
        by_rel = sorted(grp, key=lambda t: (-t[2], t[0]))
        dcg = sum(r * d(i + 1) for i, (_, _, r) in enumerate(by_score))
        idcg = sum(r * d(i + 1) for i, (_, _, r) in enumerate(by_rel))
        assert got[q] == (15, dcg, idcg), q
        if idcg:
            assert 0.0 <= dcg / idcg <= 1.0
