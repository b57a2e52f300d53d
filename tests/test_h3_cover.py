"""Polyfill cover exactness (functions/h3_geom.hex2d_polyfill /
polygon_to_cells): brute-force verification of the three guarantees the
exact H3-native PIP composition rests on —

1. completeness: every lattice cell intersecting the ring's region is in
   the cover (checked against a brute scan of the bbox lattice);
2. full-cell soundness: a cell flagged is_full lies entirely inside the
   ring (center, all 6 hexagon corners, and no ring vertex inside it);
3. per-point equivalence: cover-accept (full) ∪ ray-cast-refine (band)
   reproduces the direct ray cast for random points, bit-exactly.
"""

import math

import numpy as np
import pytest

from linear_kdtree_spark.functions.geometry import raycast_numpy
from linear_kdtree_spark.functions.h3_geom import (
    HEX_CIRCUMRADIUS,
    _ax_to_hex2d,
    hex2d_polyfill,
    hex2d_to_axial,
    polygon_to_cells,
)


def _star(cx, cy, a, b, rot=0.0):
    """Concave 8-vertex star (spike radius a, waist b/2)."""
    pts = [
        (a, 0), (b / 2, b / 2), (0, a), (-b / 2, b / 2),
        (-a, 0), (-b / 2, -b / 2), (0, -a), (b / 2, -b / 2),
    ]
    c, s = math.cos(rot), math.sin(rot)
    return [(cx + c * x - s * y, cy + s * x + c * y) for x, y in pts]


RINGS = [
    [(0.3, 0.2), (9.7, 0.9), (10.1, 9.6), (-0.4, 10.2)],  # quad
    _star(2.5, -3.0, 8.0, 3.0),                            # concave star
    _star(0.0, 0.0, 6.0, 2.0, rot=0.37),                   # rotated star
    [(0.1, 0.1), (0.9, 0.3), (0.5, 0.8)],                  # sub-cell tri
]


def _bbox_lattice(ring, pad=2.0):
    ring = np.asarray(ring, float)
    xs = np.arange(ring[:, 0].min() - pad, ring[:, 0].max() + pad, 0.5)
    ys = np.arange(ring[:, 1].min() - pad, ring[:, 1].max() + pad, 0.5)
    gx, gy = np.meshgrid(xs, ys)
    a, b = hex2d_to_axial(gx.ravel(), gy.ravel())
    return set(zip(a.tolist(), b.tolist()))


@pytest.mark.parametrize("ring", RINGS)
def test_cover_complete_vs_brute(ring):
    a, b, cin, full = hex2d_polyfill(ring)
    cover = set(zip(a.tolist(), b.tolist()))
    assert len(cover) == len(a)  # BFS never emits a cell twice
    ringa = np.asarray(ring, float)
    # brute: any cell containing one of 40k random points inside the ring
    rng = np.random.default_rng(7)
    px = rng.uniform(ringa[:, 0].min(), ringa[:, 0].max(), 40_000)
    py = rng.uniform(ringa[:, 1].min(), ringa[:, 1].max(), 40_000)
    ins = raycast_numpy(px, py, ringa)
    ca, cb = hex2d_to_axial(px[ins], py[ins])
    missing = set(zip(ca.tolist(), cb.tolist())) - cover
    assert not missing
    # brute center-in over the bbox lattice == cover's center_in set
    lat = sorted(_bbox_lattice(ring))
    la = np.array([p[0] for p in lat], dtype=np.int64)
    lb = np.array([p[1] for p in lat], dtype=np.int64)
    lx, ly = _ax_to_hex2d(la, lb)
    lin = raycast_numpy(lx, ly, ringa)
    centers_in = set(zip(la[lin].tolist(), lb[lin].tolist()))
    got_in = set(zip(a[cin].tolist(), b[cin].tolist()))
    assert got_in == centers_in


@pytest.mark.parametrize("ring", RINGS)
def test_full_cells_entirely_inside(ring):
    a, b, cin, full = hex2d_polyfill(ring)
    ringa = np.asarray(ring, float)
    if not full.any():
        return
    cx, cy = _ax_to_hex2d(a[full], b[full])
    # all 6 hexagon corners inside (corners at circumradius, angles 30+60k
    # or 0+60k; both orientations checked — covers either lattice class)
    for deg0 in (0.0, 30.0):
        for k in range(6):
            ang = math.radians(deg0 + 60.0 * k)
            qx = cx + HEX_CIRCUMRADIUS * math.cos(ang)
            qy = cy + HEX_CIRCUMRADIUS * math.sin(ang)
            assert raycast_numpy(qx, qy, ringa).all()
    # no ring vertex inside any full cell
    va, vb = hex2d_to_axial(ringa[:, 0], ringa[:, 1])
    vset = set(zip(va.tolist(), vb.tolist()))
    fset = set(zip(a[full].tolist(), b[full].tolist()))
    assert not (vset & fset)


@pytest.mark.parametrize("ring", RINGS)
def test_cover_pip_equals_raycast(ring):
    a, b, cin, full = hex2d_polyfill(ring)
    status = {
        (aa, bb): f
        for aa, bb, f in zip(a.tolist(), b.tolist(), full.tolist())
    }
    ringa = np.asarray(ring, float)
    rng = np.random.default_rng(11)
    px = rng.uniform(ringa[:, 0].min() - 3, ringa[:, 0].max() + 3, 20_000)
    py = rng.uniform(ringa[:, 1].min() - 3, ringa[:, 1].max() + 3, 20_000)
    pa, pb = hex2d_to_axial(px, py)
    direct = raycast_numpy(px, py, ringa)
    via = np.zeros(len(px), dtype=bool)
    for idx in range(len(px)):
        st = status.get((int(pa[idx]), int(pb[idx])))
        if st is None:
            via[idx] = False  # outside the cover => outside
        elif st:
            via[idx] = True  # full cell => inside, no exact test
        else:
            via[idx] = raycast_numpy(
                px[idx : idx + 1], py[idx : idx + 1], ringa
            )[0]
    assert (via == direct).all()


def test_polygon_to_cells_latlng_center_semantics():
    # ring around a res-7 area; verify center-containment against the
    # forward path: every returned cell's center maps back into the ring
    from linear_kdtree_spark.functions.h3_geom import cell_to_latlng
    from linear_kdtree_spark.functions.h3 import (
        cell_resolution,
        latlng_to_cell,
    )

    ring = [(37.70, -122.10), (37.78, -122.10), (37.78, -121.98),
            (37.70, -121.98)]
    cells = polygon_to_cells(ring, 8)
    assert len(cells) > 50
    assert all(cell_resolution(int(h)) == 8 for h in cells)
    # centers of returned cells land back in their own cell (round trip)
    lat_deg, lng_deg = cell_to_latlng(cells[:20])
    back = latlng_to_cell(lat_deg, lng_deg, 8)
    assert (back == cells[:20]).all()
    # cover mode flags at least one interior cell full for this ring size
    cover, is_full = polygon_to_cells(ring, 8, cover=True)
    assert is_full.any()
    assert set(cells.tolist()) <= set(cover.tolist())


def test_multi_face_ring_raises():
    ring = [(10.0, 100.0), (15.0, 179.0), (-20.0, -170.0)]
    with pytest.raises(NotImplementedError):
        polygon_to_cells(ring, 5)


def test_runaway_ring_guarded():
    with pytest.raises(ValueError):
        hex2d_polyfill(
            [(0, 0), (4000, 0), (4000, 4000), (0, 4000)], max_cells=10_000
        )
