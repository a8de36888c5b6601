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
