"""H3 geometry (functions/h3_geom.py): inverse walk, k-ring, boundary.

Validation philosophy (module docstring): nothing here is checked against
a transcribed table — the inverse direction is pinned by EXHAUSTIVE
round-trip through the independently-gated forward path, and the
boundary by global tiling invariants (vertex counts, exact shared
vertices between neighbors, spherical areas summing to 4π).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from linear_kdtree_spark.functions import h3_geom as G
from linear_kdtree_spark.functions.h3 import (
    CCW_DIGIT,
    CW_DIGIT,
    is_pentagon,
    latlng_to_cell,
    uncompact_cells,
)


def _res0_cells():
    pad = sum(7 << (45 - 3 * r) for r in range(1, 16))
    return np.array(
        sorted(
            (np.int64(1) << 59) | (np.int64(bc) << 45) | np.int64(pad)
            for bc in range(122)
        ),
        dtype=np.int64,
    )


def _unit(latd, lngd):
    la, lo = math.radians(latd), math.radians(lngd)
    return np.array([
        math.cos(la) * math.cos(lo),
        math.cos(la) * math.sin(lo),
        math.sin(la),
    ])


def test_axial_ops_match_digit_tables():
    """The axial 60° rotations must act on digit unit vectors exactly as
    the published digit rotation tables (h3.py CCW_DIGIT/CW_DIGIT)."""
    for d in range(7):
        a, b = int(G._DIGIT_A[d]), int(G._DIGIT_B[d])
        ra, rb = G._rot60ccw(a, b)
        (dd,) = [t for t in range(7)
                 if (G._DIGIT_A[t], G._DIGIT_B[t]) == (ra, rb)]
        assert dd == int(CCW_DIGIT[d])
        ra, rb = G._rot60cw(a, b)
        (dd,) = [t for t in range(7)
                 if (G._DIGIT_A[t], G._DIGIT_B[t]) == (ra, rb)]
        assert dd == int(CW_DIGIT[d])


def test_up_ap7r_inverts_down():
    rng = np.random.default_rng(0)
    a = rng.integers(-50, 50, 200)
    b = rng.integers(-50, 50, 200)
    da, db = G._down_ap7r_ax(a, b)
    ua, ub = G._up_ap7r_ax(da, db)
    assert (ua == a).all() and (ub == b).all()


def test_face_neighbor_gluing_derives():
    fn = G._face_neighbors()
    assert len(fn) == 60  # 20 faces x 3 edge quadrants
    for f in range(20):
        for q in ("IJ", "KI", "JK"):
            g, rot, (ta, tb) = fn[(f, q)]
            assert 0 <= g < 20 and g != f and 0 <= rot < 6


@pytest.mark.parametrize("res", [0, 1, 2])
def test_roundtrip_exhaustive(res):
    """EVERY cell at res 0-2 (all pentagons, all face crossings, both
    classes): center -> forward path -> same cell."""
    cells = uncompact_cells(_res0_cells(), res)
    lat, lng = G.cell_to_latlng(cells)
    back = latlng_to_cell(lat, lng, res)
    assert (back == cells).all()


def test_roundtrip_deep_res():
    rng = np.random.default_rng(5)
    for res in [7, 15]:
        la = rng.uniform(-89, 89, 3000)
        lo = rng.uniform(-180, 180, 3000)
        h = latlng_to_cell(la, lo, res)
        clat, clng = G.cell_to_latlng(h)
        assert (latlng_to_cell(clat, clng, res) == h).all(), res


def test_grid_disk_sizes_and_pentagons():
    cells = uncompact_cells(_res0_cells(), 2)
    pents = cells[is_pentagon(cells)]
    hexes = cells[~is_pentagon(cells)]
    rng = np.random.default_rng(9)
    for h in hexes[rng.integers(0, len(hexes), 8)]:
        for k in [1, 2]:
            d = G.grid_disk(int(h), k)
            if not is_pentagon(d).any():
                assert len(d) == 1 + 3 * k * (k + 1), (hex(h), k)
            assert int(h) in d
    assert len(pents) == 12
    for p in pents[:3]:
        assert len(G.neighbors(np.array([p]))[0]) == 5
        assert len(G.grid_disk(int(p), 1)) == 6


def test_adjacency_symmetric():
    cells = uncompact_cells(_res0_cells(), 1)
    rng = np.random.default_rng(2)
    batch = cells[rng.integers(0, len(cells), 12)]
    nb = G.neighbors(batch)
    for i, h in enumerate(batch):
        for c in nb[i]:
            back = G.neighbors(np.array([c], dtype=np.int64))[0]
            assert int(h) in back


@pytest.mark.parametrize("res", [0, 1])
def test_boundary_tiles_the_sphere(res):
    """Vertex counts (6 hex / 5 pentagon) and spherical polygon areas
    summing to the full sphere — a global exactness check on every
    boundary vertex position at once."""
    cells = uncompact_cells(_res0_cells(), res)
    total = 0.0
    for h in cells:
        b = G.cell_to_boundary(int(h))
        pent = bool(is_pentagon(np.array([h]))[0])
        assert len(b) == (5 if pent else 6), hex(h)
        v = [_unit(a, o) for a, o in b]
        for i in range(1, len(v) - 1):
            num = abs(np.dot(v[0], np.cross(v[i], v[i + 1])))
            den = (1 + np.dot(v[0], v[i]) + np.dot(v[i], v[i + 1])
                   + np.dot(v[0], v[i + 1]))
            total += 2 * math.atan2(num, den)
    assert total == pytest.approx(4 * math.pi, rel=1e-9)


def test_boundary_contains_center_and_interior():
    cells = uncompact_cells(_res0_cells(), 2)
    rng = np.random.default_rng(3)
    for h in cells[rng.integers(0, len(cells), 12)]:
        b = G.cell_to_boundary(int(h))
        clat, clng = G.cell_to_latlng(np.array([h]))
        for frac in [0.3, 0.8]:
            la = clat[0] + frac * (b[:, 0] - clat[0])
            lo = clng[0] + frac * (b[:, 1] - clng[0])
            assert (latlng_to_cell(la, lo, 2) == h).all()


def test_neighbors_share_exactly_two_vertices():
    cells = uncompact_cells(_res0_cells(), 2)
    rng = np.random.default_rng(7)
    for h in cells[rng.integers(0, len(cells), 6)]:
        bh = G.cell_to_boundary(int(h))
        for c in G.neighbors(np.array([h], dtype=np.int64))[0]:
            bc = G.cell_to_boundary(int(c))
            shared = sum(
                1
                for v1 in bh
                for v2 in bc
                if float(np.dot(_unit(*v1), _unit(*v2))) > 1 - 1e-15
            )
            assert shared == 2, (hex(h), hex(c))


def test_h3_disk_expand_and_boundary_spark(spark):
    """Spark operators: disk expansion joins points to their k-ring (the
    H3-native radius-join expansion) and boundary vectorization returns
    the exact vertex arrays."""
    import pandas as pd
    from pyspark.sql import functions as F

    from linear_kdtree_spark.operators.tile import (
        assign_tiles_h3,
        h3_boundary,
        h3_disk_expand,
    )

    rng = np.random.default_rng(21)
    pdf = pd.DataFrame({
        "id": np.arange(40),
        "x": rng.uniform(-120, -60, 40),
        "y": rng.uniform(10, 50, 40),
    })
    df = assign_tiles_h3(spark.createDataFrame(pdf), 4)
    ex = h3_disk_expand(df, "h3_cell", k=2).toPandas()
    # per row: 1 + 3*2*3 = 19 disk cells away from pentagons (none here)
    sizes = ex.groupby("id").size()
    assert (sizes == 19).all()
    # distance-0 row is the cell itself; BFS distances match grid_disk
    for rid, grp in ex.groupby("id"):
        own = grp[grp["grid_distance"] == 0]
        assert len(own) == 1
        assert (own["disk_cell"] == own["h3_cell"]).all()
        d1 = set(grp[grp["grid_distance"] <= 1]["disk_cell"])
        assert d1 == set(
            G.grid_disk(int(own["h3_cell"].iloc[0]), 1).tolist()
        )

    bd = h3_boundary(df, "h3_cell").toPandas()
    for _, row in bd.iterrows():
        verts = np.vstack([np.asarray(v) for v in row["boundary"]])
        assert verts.shape == (6, 2)
        ref = G.cell_to_boundary(int(row["h3_cell"]))
        assert np.allclose(verts, ref, atol=0)


def test_h3_parent_col_coarser_cell_is_null(spark):
    """Truncating a cell to a FINER 'parent' is meaningless: the column
    expression yields NULL where the numpy twin raises (review r5 — it
    previously emitted malformed ids)."""
    from pyspark.sql import functions as F

    from linear_kdtree_spark.functions.h3 import latlng_to_cell
    from linear_kdtree_spark.operators.tile import h3_parent_col

    c5 = int(latlng_to_cell([37.775], [-122.419], 5)[0])
    df = spark.createDataFrame([(c5,)], "cell long")
    row = df.select(
        h3_parent_col(F.col("cell"), 3).alias("up"),
        h3_parent_col(F.col("cell"), 5).alias("same"),
        h3_parent_col(F.col("cell"), 9).alias("down"),
    ).first()
    assert row["up"] is not None and row["down"] is None
    assert row["same"] == c5


def test_h3_disk_expand_null_and_sentinel_rows(spark):
    """NULL or H3_NULL(0) cells expand to nothing instead of crashing the
    task with a NaN->int64 cast error (review r5)."""
    from pyspark.sql import functions as F

    from linear_kdtree_spark.functions.h3 import latlng_to_cell
    from linear_kdtree_spark.operators.tile import h3_disk_expand

    good = int(latlng_to_cell([10.0], [20.0], 6)[0])
    df = spark.createDataFrame(
        [(1, good), (2, None), (3, 0)], "row_id long, h3_cell long"
    )
    out = h3_disk_expand(df, k=1).collect()
    assert {r["row_id"] for r in out} == {1}
    assert len(out) == 7  # hexagon k=1 disk
