"""hmm_map_match (geo/matching.py) vs a brute-force candidate + DP reference."""

import math

from morituri_spark.geo.matching import hmm_map_match, snap_to_segments


def _r9(x):
    return math.floor(x * 1e9 + 0.5 + 1e-8) / 1e9


def _nano(x):
    return int(math.floor(x * 1e9 + 0.5 + 1e-8))


def _seg_dist(px, py, ax, ay, bx, by):
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    t = 0.0 if len2 == 0.0 else min(max(((px - ax) * dx + (py - ay) * dy) / len2, 0.0), 1.0)
    ex, ey = px - (ax + t * dx), py - (ay + t * dy)
    return math.sqrt(ex * ex + ey * ey)


def _fixture():
    """20 tracks x 6 steps along x ~ 2t; 3 near-parallel segments per
    column. Points drift in x so the cheapest INDEPENDENT snap flips
    between the column's segments while a coherent path pays switches."""
    pts, segs = [], []
    for t in range(20):
        for s in range(6):
            px = 2.0 * t + 0.1 * s + ((t * 7 + s * 13) % 10) / 100.0
            py = 0.6 * s + ((t * 3 + s * 5) % 7) / 100.0
            pts.append((t, s, t * 6 + s, px, py))
    for c in range(20):
        for m in range(3):
            j = c * 3 + m
            ax = 2.0 * c + 0.06 * m - 0.06
            segs.append((j, ax, 0.0, ax + 0.15, 3.2))
    return pts, segs


def _ref_path(pts, segs, radius, lam):
    """per track: brute-force candidates + the kernel's exact DP/tie rules."""
    INF = float("inf")
    out = {}
    tracks = {}
    for t, s, pid, px, py in pts:
        tracks.setdefault(t, []).append((s, pid, px, py))
    for t, steps in tracks.items():
        layers = []  # (s, [(seg, e_nano, dist)])
        for s, pid, px, py in sorted(steps):
            cand = []
            for j, ax, ay, bx, by in segs:
                d = _seg_dist(px, py, ax, ay, bx, by)
                if _r9(d) <= radius:
                    cand.append((j, _nano(d), _r9(d), pid))
            if cand:
                layers.append((s, sorted(cand)))
        # forward
        costs = []  # per layer: {seg: cost}
        for li, (s, cand) in enumerate(layers):
            cur = {}
            for j, e, _, _ in cand:
                if li == 0:
                    cur[j] = e
                else:
                    best = min(
                        pc + (0 if pj == j else lam)
                        for pj, pc in costs[-1].items()
                    )
                    cur[j] = best + e
            costs.append(cur)
        if not costs:
            continue
        # backtrack: min (cost, state) final; min achieving predecessor
        last = costs[-1]
        cur_state = min(last, key=lambda j: (last[j], j))
        cur_cost = last[cur_state]
        chosen = {layers[-1][0]: cur_state}
        for li in range(len(layers) - 2, -1, -1):
            e_cur = dict((j, e) for j, e, _, _ in layers[li + 1][1])[cur_state]
            need = cur_cost - e_cur
            ach = sorted(
                j for j, c in costs[li].items()
                if c + (0 if j == cur_state else lam) == need
            )
            cur_state = ach[0]
            cur_cost = costs[li][cur_state]
            chosen[layers[li][0]] = cur_state
        for s, cand in layers:
            j = chosen[s]
            row = next(c for c in cand if c[0] == j)
            out[(t, s)] = (row[3], j, row[2])
    return out


def test_hmm_matches_reference_dp(spark):
    pts, segs = _fixture()
    lam = 20_000_000
    pdf = spark.createDataFrame(
        pts, "track_id long, seq long, point_id long, lon double, lat double"
    )
    sdf = spark.createDataFrame(
        segs, "seg_id long, ax double, ay double, bx double, by double"
    )
    got = {
        (r["track_id"], r["seq"]): (r["point_id"], r["seg_id"], r["dist"])
        for r in hmm_map_match(
            pdf, sdf, radius=0.6, cell_deg=1.0, switch_cost_nano=lam
        ).collect()
    }
    want = _ref_path(pts, segs, 0.6, lam)
    assert got == want
    assert len(got) == 120  # every point decoded


def test_hmm_is_more_coherent_than_independent_snap(spark):
    pts, segs = _fixture()
    pdf = spark.createDataFrame(
        pts, "track_id long, seq long, point_id long, lon double, lat double"
    )
    sdf = spark.createDataFrame(
        segs, "seg_id long, ax double, ay double, bx double, by double"
    )
    indep = {
        r["point_id"]: r["seg_id"]
        for r in snap_to_segments(pdf, sdf, radius=0.6, cell_deg=1.0).collect()
    }
    hmm = {
        r["point_id"]: (r["track_id"], r["seq"], r["seg_id"])
        for r in hmm_map_match(
            pdf, sdf, radius=0.6, cell_deg=1.0, switch_cost_nano=100_000_000
        ).collect()
    }

    def switches(assign):
        n = 0
        for t in range(20):
            seq = [assign[t * 6 + s] for s in range(6) if t * 6 + s in assign]
            n += sum(1 for a, b in zip(seq, seq[1:]) if a != b)
        return n

    hmm_assign = {pid: seg for pid, (_, _, seg) in hmm.items()}
    assert switches(hmm_assign) < switches(indep)
    # with a large switch cost every track stays on ONE segment
    assert switches(hmm_assign) == 0
