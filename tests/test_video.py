"""Block-matching motion estimation — vs loop references."""

def test_block_flow_loop_reference(spark):
    import numpy as np
    import pandas as pd

    from morituri_spark.multimodal.video import block_flow

    rng = np.random.default_rng(91)
    W, H, B, R = 20, 16, 8, 2
    rows_c, rows_n = [], []
    imgs = {}
    for g in range(5):
        cur = rng.integers(0, 256, size=(H, W)).astype(np.int64)
        nxt = rng.integers(0, 256, size=(H, W)).astype(np.int64)
        imgs[g] = (cur, nxt)
        for iy in range(H):
            for ix in range(W):
                rows_c.append((g, ix, iy, int(cur[iy, ix])))
                rows_n.append((g, ix, iy, int(nxt[iy, ix])))
    cols = ["g", "ix", "iy", "v"]
    dc = spark.createDataFrame(pd.DataFrame(rows_c, columns=cols))
    dn = spark.createDataFrame(pd.DataFrame(rows_n, columns=cols))
    got = {
        (r.g, r.bx, r.by): (r.sad, r.dx, r.dy)
        for r in block_flow(dc, dn, keys=["g"], block=B, radius=R).collect()
    }
    want = {}
    for g, (cur, nxt) in imgs.items():
        for by in range(H // B):
            for bx in range(W // B):
                blk = cur[by * B:(by + 1) * B, bx * B:(bx + 1) * B]
                best = None
                for dx in range(-R, R + 1):
                    for dy in range(-R, R + 1):
                        x0, y0 = bx * B + dx, by * B + dy
                        if x0 < 0 or y0 < 0 or x0 + B > W or y0 + B > H:
                            continue
                        sad = int(np.abs(blk - nxt[y0:y0 + B, x0:x0 + B]).sum())
                        key = (sad, dx, dy)
                        if best is None or key < best:
                            best = key
                if best is not None:
                    want[(g, bx, by)] = best
    assert got == want
    # interior blocks have all 25 candidates; edge blocks fewer but >0
    assert len(got) == 5 * (W // B) * (H // B)


def test_block_flow_recovers_known_shift(spark):
    import numpy as np
    import pandas as pd

    from morituri_spark.multimodal.video import block_flow

    rng = np.random.default_rng(97)
    W = H = 16
    cur = rng.integers(0, 256, size=(H, W)).astype(np.int64)
    nxt = np.roll(np.roll(cur, 1, axis=0), -2, axis=1)  # shift dy=+1, dx=-2
    rows_c = [(0, x, y, int(cur[y, x])) for y in range(H) for x in range(W)]
    rows_n = [(0, x, y, int(nxt[y, x])) for y in range(H) for x in range(W)]
    cols = ["g", "ix", "iy", "v"]
    dc = spark.createDataFrame(pd.DataFrame(rows_c, columns=cols))
    dn = spark.createDataFrame(pd.DataFrame(rows_n, columns=cols))
    out = {(r.bx, r.by): (r.sad, r.dx, r.dy)
           for r in block_flow(dc, dn, keys=["g"], block=8, radius=2).collect()}
    # the interior-consistent shifted copy: block (0..1, 0..1) shifted
    # content appears at (x-2, y+1) → block (1, 0) of cur matches at
    # dx=-2, dy=+1 with SAD 0 (its target window stays in-frame)
    assert out[(1, 0)] == (0, -2, 1)


def test_block_flow_dense_matches_join_path(spark):
    import numpy as np
    import pandas as pd

    from morituri_spark.multimodal.video import block_flow, block_flow_dense

    rng = np.random.default_rng(101)
    W, H = 24, 16
    rows_c, rows_n = [], []
    for g in range(6):
        cur = rng.integers(0, 256, size=(H, W)).astype(np.int64)
        nxt = rng.integers(0, 256, size=(H, W)).astype(np.int64)
        for iy in range(H):
            for ix in range(W):
                rows_c.append((g, ix, iy, int(cur[iy, ix])))
                rows_n.append((g, ix, iy, int(nxt[iy, ix])))
    cols = ["g", "ix", "iy", "v"]
    dc = spark.createDataFrame(pd.DataFrame(rows_c, columns=cols))
    dn = spark.createDataFrame(pd.DataFrame(rows_n, columns=cols))
    a = sorted(
        tuple(r) for r in
        block_flow(dc, dn, keys=["g"], block=8, radius=2).collect()
    )
    b = sorted(
        tuple(r) for r in
        block_flow_dense(dc, dn, dims=(W, H), keys=["g"], block=8,
                         radius=2).collect()
    )
    assert a == b and len(a) == 6 * (W // 8) * (H // 8)
