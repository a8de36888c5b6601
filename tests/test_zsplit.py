"""W1 z-level splitting — all 44 golden vectors from the reference
(/root/reference/tests/navteq/test_navteq2osm.cpp:47-101): node-z sequence →
expected way-z sequence (ways in emission order)."""

import pytest

from morituri_spark.operators import zsplit

# Golden vectors live in the package so the driver contract can reuse them.
GOLDEN = zsplit.GOLDEN_VECTORS


def _pairs(node_z: str):
    zs = [int(t) for t in node_z.split()]
    return len(zs), [(i, z) for i, z in enumerate(zs) if z != 0]


@pytest.mark.parametrize("node_z,want", GOLDEN, ids=[g[0] for g in GOLDEN])
def test_golden_vector_python(node_z, want):
    n, pairs = _pairs(node_z)
    segs = zsplit.split_link(n, pairs)
    assert [z for _, _, z in segs] == want
    # segment geometry invariants: contiguous coverage of [0, n-1]
    assert segs[0][0] == 0 and segs[-1][1] == n - 1
    for (f0, t0, _), (f1, t1, _) in zip(segs, segs[1:]):
        assert t0 == f1 and f0 < t0 and f1 < t1


def test_all_vectors_through_spark_operator(spark):
    """One DataFrame with all 44 links → split_ways → per-link z sequences."""
    from morituri_spark.sources.synth import zlevels_table
    import pyspark.sql.functions as F

    vectors = [(100 + i, [int(t) for t in s.split()]) for i, (s, _) in enumerate(GOLDEN)]
    zl = zlevels_table(spark, vectors)
    groups = zsplit.prepare_z_groups(zl)
    n_points = spark.createDataFrame(
        [(100 + i, len(s.split())) for i, (s, _) in enumerate(GOLDEN)],
        "link_id long, n_points int",
    )
    inp = n_points.join(groups, "link_id", "left").withColumn(
        "is_ferry", F.lit(False)
    ).withColumn("z_pairs", F.coalesce("z_pairs", F.array()))
    segs = zsplit.split_ways(inp)
    got = {
        r["link_id"]: [s["z_lvl"] for s in r["segs"]]
        for r in segs.groupBy("link_id")
        .agg(F.sort_array(F.collect_list(F.struct("seg_seq", "z_lvl"))).alias("segs"))
        .collect()
    }
    for i, (s, want) in enumerate(GOLDEN):
        assert got[100 + i] == want, f"vector {s!r}: got {got[100+i]}, want {want}"


def _golden_input(spark):
    from morituri_spark.sources.synth import zlevels_table
    import pyspark.sql.functions as F

    vectors = [(100 + i, [int(t) for t in s.split()]) for i, (s, _) in enumerate(GOLDEN)]
    zl = zlevels_table(spark, vectors)
    groups = zsplit.prepare_z_groups(zl)
    n_points = spark.createDataFrame(
        [(100 + i, len(s.split())) for i, (s, _) in enumerate(GOLDEN)],
        "link_id long, n_points int",
    )
    return n_points.join(groups, "link_id", "left").withColumn(
        "is_ferry", F.lit(False)
    ).withColumn("z_pairs", F.coalesce("z_pairs", F.array()))


def test_catalyst_split_matches_arrow_on_goldens(spark):
    """split_ways_catalyst (the pure-expression fold) must produce the exact
    segment table of the Arrow kernel on all 44 goldens — from/to indices
    included, not just z sequences."""
    inp = _golden_input(spark)
    key = ["link_id", "seg_seq", "from_idx", "to_idx", "z_lvl"]
    arrow = sorted(tuple(r) for r in zsplit.split_ways(inp).select(key).collect())
    cata = sorted(tuple(r) for r in zsplit.split_ways_catalyst(inp).select(key).collect())
    assert cata == arrow


def test_catalyst_split_ferry_and_range(spark):
    import pyspark.sql.functions as F
    from morituri_spark.sources.synth import zlevels_table

    # ferry: interior pairs dropped → single whole-way z=0 segment
    zl = zlevels_table(spark, [(1, [0, 2, 1, 0, 0, 2])])
    inp = (
        spark.createDataFrame([(1, 6)], "link_id long, n_points int")
        .join(zsplit.prepare_z_groups(zl), "link_id")
        .withColumn("is_ferry", F.lit(True))
    )
    rows = zsplit.split_ways_catalyst(inp).collect()
    # pairs (1,2),(2,1) interior dropped; (5,2) at n-1 kept → splits apply
    arrow = zsplit.split_ways(inp).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, arrow))
    # z out of range raises through the expression guard
    zl_bad = zlevels_table(spark, [(2, [0, 7, 0])])
    bad = (
        spark.createDataFrame([(2, 3)], "link_id long, n_points int")
        .join(zsplit.prepare_z_groups(zl_bad), "link_id")
        .withColumn("is_ferry", F.lit(False))
    )
    with pytest.raises(Exception, match="z_lvl is not valid"):
        zsplit.split_ways_catalyst(bad).collect()


def test_catalyst_split_property_random(spark):
    """Property: random z vectors — Catalyst fold ≡ Python kernel."""
    import numpy as np
    import pyspark.sql.functions as F
    from morituri_spark.sources.synth import zlevels_table

    rng = np.random.default_rng(3)
    vectors = []
    for i in range(300):
        n = int(rng.integers(2, 12))
        zs = rng.choice([-2, -1, 0, 0, 0, 1, 1, 2, 3], size=n).tolist()
        vectors.append((1000 + i, [int(z) for z in zs]))
    zl = zlevels_table(spark, vectors)
    n_points = spark.createDataFrame(
        [(lid, len(zs)) for lid, zs in vectors], "link_id long, n_points int"
    )
    inp = n_points.join(zsplit.prepare_z_groups(zl), "link_id", "left").withColumn(
        "is_ferry", F.expr("link_id % 3 = 0")
    ).withColumn("z_pairs", F.coalesce("z_pairs", F.array()))
    key = ["link_id", "seg_seq", "from_idx", "to_idx", "z_lvl"]
    arrow = sorted(tuple(r) for r in zsplit.split_ways(inp).select(key).collect())
    cata = sorted(tuple(r) for r in zsplit.split_ways_catalyst(inp).select(key).collect())
    assert cata == arrow


def test_ferry_normalization():
    # interior z zeroed; endpoints kept only if at vertex 0 / n-1
    assert zsplit.set_ferry_z_lvls_to_zero([(0, 2), (3, 1), (5, 2)], 6) == [(0, 2), (5, 2)]
    assert zsplit.set_ferry_z_lvls_to_zero([(1, 2), (3, 1), (5, 2)], 6) == [(5, 2)]
    assert zsplit.set_ferry_z_lvls_to_zero([(0, 2), (3, 1), (4, 2)], 6) == [(0, 2)]
    assert zsplit.set_ferry_z_lvls_to_zero([(1, 2), (3, 1), (4, 2)], 6) == []
    # a lone entry survives only when it sits at BOTH checks' targets:
    # index 0 passes the erase-first check but fails erase-last (≠ n-1)
    assert zsplit.set_ferry_z_lvls_to_zero([(0, 3)], 4) == []
    assert zsplit.set_ferry_z_lvls_to_zero([(0, 3), (3, 1)], 4) == [(0, 3), (3, 1)]


def test_z_range_enforced():
    with pytest.raises(ValueError):
        zsplit.split_link(3, [(1, 6)])
    with pytest.raises(ValueError):
        zsplit.split_link(3, [(1, -5)])
