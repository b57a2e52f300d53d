"""H3 cell GEOMETRY from scratch: centers, neighborhoods, boundaries.

Companion to functions/h3.py (forward latLngToCell): this module adds the
inverse direction and the neighborhood/geometry surface the r4 verdict
called out — ``cell_to_latlng`` (h3ToGeo), ``grid_disk`` (k-ring) and
``cell_to_boundary`` — everything derived from the same PUBLIC spec
(h3geo.org / uber/h3, Apache-2.0) and the constants already vendored with
citation in functions/h3_tables.py.

Same derivation philosophy as tools/h3_tablegen.py: published tables are
NOT transcribed where they can be derived and self-validated —

- the face-neighbor gluing (``faceijk.c::faceNeighbors``: which face lies
  across each icosahedron edge, and the 60°-rotation + lattice translate
  mapping one face's hex lattice into the other's) is DERIVED numerically
  in :func:`_derive_face_neighbors`: sample lattice points just past a
  face edge, project both frames, solve the unique (face, rot, translate)
  gluing in axial coordinates, verify on extra samples;
- the inverse walk (``h3Index.c::_h3ToFaceIjk`` shape: base-cell home
  coordinates, per-res aperture-7 down plus digit neighbor step, pentagon
  leading-digit rotations, Class-II overage adjustment) is validated by
  EXHAUSTIVE round-trip through the driver-gated forward path: for every
  cell at res 0-2 (122 / 842 / 5 882 cells, all pentagons, all face
  crossings) ``latlng_to_cell(cell_to_latlng(h)) == h``
  (tests/test_h3_geom.py).

All lattice arithmetic is in AXIAL coordinates (a = i - k, b = j - k):
ijk+ normalization becomes the identity, and every published ijk+ op is a
2x2 integer linear map (derivations in each docstring).

``grid_disk`` is ring-BFS on the exact adjacency graph: a cell's
neighbors are the forward-mapped centers of its 6 surrounding lattice
positions, kept only when adjacency is MUTUAL — which reproduces H3
adjacency across face seams and around pentagons (5 neighbors) without
the per-case neighbor-rotation tables.

``cell_to_boundary`` returns the exact spherical vertex set (substrate
33r grid vertices with substrate overage adjustment, per
``faceijk.c::_faceIjkToVerts`` / ``_faceIjkToCellBoundary`` shapes).
Known fidelity boundary, documented: H3 additionally inserts a
"distortion vertex" where a Class-III cell edge crosses an icosahedron
edge (reference _faceIjkToCellBoundary's intersection branch); this
implementation returns the topological vertices only, so such edges are
chords of the fold instead of two segments. Vertex POSITIONS are exact
for both classes. Pentagon boundaries (5 vertices) are derived exactly
from their neighbor hexagons' shared vertices.

The reference engine (rob05c/linear-kdtree, lkt.h:34-45) has no tiling
surface; this belongs to the engine's mandated H3 query surface
(SURVEY.md §2.3-Q3).
"""

from __future__ import annotations

import math

import numpy as np

from linear_kdtree_spark.functions.h3 import (
    MAX_RES,
    M_AP7_ROT_RADS,
    M_SQRT7,
    RES0_U_GNOMONIC,
    SIN60,
    _BC_PENT,
    _FACE_AZ0,
    _FACE_LAT,
    _FACE_LNG,
    _hex2d_to_coord_ij,
    cell_base,
    cell_resolution,
    latlng_to_cell,
    latlng_to_face_hex2d,
)
from linear_kdtree_spark.functions.h3_tables import BASE_CELL_DATA

_BC_FACE = np.array([d[0] for d in BASE_CELL_DATA], dtype=np.int64)
_BC_HOME_A = np.array([d[1][0] - d[1][2] for d in BASE_CELL_DATA],
                      dtype=np.int64)
_BC_HOME_B = np.array([d[1][1] - d[1][2] for d in BASE_CELL_DATA],
                      dtype=np.int64)

# digit -> axial unit vector (coordijk.c UNIT_VECS, digit = 4i + 2j + k;
# axial a = i - k, b = j - k)
_DIGIT_A = np.array([0, -1, 0, -1, 1, 0, 1], dtype=np.int64)
_DIGIT_B = np.array([0, -1, 1, 0, 0, -1, 1], dtype=np.int64)
_CW_DIGIT = np.array([0, 3, 6, 2, 5, 1, 4], dtype=np.int64)


# --- axial-coordinate lattice ops (each a 2x2 int map; derivations in
# --- the docstrings, validated in tests against the ijk+ forms) --------

def _rot60ccw(a, b):
    """ijk+ _ijkRotate60ccw (i,j,k)->(i+k, i+j, j+k) in axial: since
    a=i-k, b=j-k: a' = (i+k)-(j+k) = a-b, b' = (i+j)-(j+k) = a."""
    return a - b, a


def _rot60cw(a, b):
    """ijk+ _ijkRotate60cw (i,j,k)->(i+j, j+k, i+k): a' = b, b' = b-a."""
    return b, b - a


def _down_ap7_ax(a, b):
    """coordijk.c _downAp7 (iVec{3,0,1} jVec{1,3,0} kVec{0,1,3}):
    a' = 2a + b, b' = 3b - a."""
    return 2 * a + b, 3 * b - a


def _down_ap7r_ax(a, b):
    """coordijk.c _downAp7r (iVec{3,1,0} jVec{0,3,1} kVec{1,0,3}):
    a' = 3a - b, b' = a + 2b."""
    return 3 * a - b, a + 2 * b


def _up_ap7r_ax(a, b):
    """coordijk.c _upAp7r via exact integer lround (h3.py _lround_div7):
    a' = lround((2a + b)/7), b' = lround((3b - a)/7)."""
    return (2 * (2 * a + b) + 7) // 14, (2 * (3 * b - a) + 7) // 14


def _down_ap3_ax(a, b):
    """coordijk.c _downAp3 (iVec{2,0,1} jVec{1,2,0} kVec{0,1,2}):
    i'=2i+j, j'=2j+k, k'=i+2k -> a' = 2a+b-... = a + (a+b) - ...
    direct: a' = (2i+j)-(i+2k) = i+j-2k = a+b, b' = (2j+k)-(i+2k)
    = 2j-i-k = 2b-a."""
    return a + b, 2 * b - a


def _down_ap3r_ax(a, b):
    """coordijk.c _downAp3r (iVec{2,1,0} jVec{0,2,1} kVec{1,0,2}):
    i'=2i+k, j'=i+2j, k'=j+2k -> a' = 2i+k-j-2k = 2a-b,
    b' = i+2j-j-2k = a+b."""
    return 2 * a - b, a + b


def _ax_to_hex2d(a, b):
    """coordijk.c _ijkToHex2d: x = (i-k) - (j-k)/2, y = (j-k)*sin60."""
    return a - b / 2.0, b * SIN60


# --- spherical helpers --------------------------------------------------

def _geo_az_distance(lat0, lng0, az, r):
    """Destination point at azimuth ``az`` / angular distance ``r`` from
    (lat0, lng0) — the spherical direct problem (faceijk.c
    _geoAzDistanceRads shape)."""
    sl0, cl0 = np.sin(lat0), np.cos(lat0)
    sr, cr = np.sin(r), np.cos(r)
    lat = np.arcsin(np.clip(sl0 * cr + cl0 * sr * np.cos(az), -1.0, 1.0))
    lng = lng0 + np.arctan2(np.sin(az) * sr * cl0,
                            cr - sl0 * np.sin(lat))
    lng = np.remainder(lng + math.pi, 2 * math.pi) - math.pi
    return lat, lng


def _hex2d_to_latlng(face, x, y, res, substrate=False):
    """Inverse of h3.latlng_to_face_hex2d for a KNOWN face (faceijk.c
    _hex2dToGeo): hex2d radius -> inverse gnomonic angular distance,
    hex2d angle -> azimuth from the face's published i-axis. ``res`` may
    be an array (substrate boundary verts use res+1 on Class III)."""
    face = np.asarray(face, dtype=np.int64)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    res = np.asarray(res, dtype=np.float64)
    rr = np.hypot(x, y)
    scale = RES0_U_GNOMONIC / M_SQRT7 ** res
    if substrate:
        scale = scale / 3.0
    r = np.arctan(rr * scale)
    theta = np.arctan2(y, x)
    # Class III resolutions are rotated ap7 ccw vs the face axes
    odd = (np.asarray(res, dtype=np.int64) % 2) == 1
    az = _FACE_AZ0[face] - (theta + np.where(odd, M_AP7_ROT_RADS, 0.0))
    lat0, lng0 = _FACE_LAT[face], _FACE_LNG[face]
    lat = np.where(r < 1e-16, lat0, 0.0)
    lng = np.where(r < 1e-16, lng0, 0.0)
    glat, glng = _geo_az_distance(lat0, lng0, az, r)
    lat = np.where(r < 1e-16, lat0, glat)
    lng = np.where(r < 1e-16, lng0, glng)
    return lat, lng


# --- derived face-neighbor gluing (faceijk.c faceNeighbors) -------------

_FN_CACHE = None


def _derive_face_neighbors():
    """Derive the (face, quadrant) -> (new_face, ccw_rot60, translate)
    gluing table numerically — the faceijk.c ``faceNeighbors`` constants,
    re-derived instead of transcribed (same policy as the base-cell
    lookup in tools/h3_tablegen.py).

    For each face F and overage quadrant Q (IJ: k==0, KI: k>0 & j==0,
    JK: k>0 & j>0 — the dispatch in _adjustOverageClassII), sample res-2
    lattice points a little past F's edge, obtain their TRUE (face, ijk)
    from the forward front-end, and solve the unique 60°-rotation +
    translate mapping F-frame axial coords onto the new face's. The
    translate is stored at res-0 unit scale (it must divide exactly by
    unitScale(res=2) = 7 — asserted)."""
    out = {}
    # res 4: unit 49 — samples land at most ~15 % past the face edge,
    # where the two faces' lattices still agree to well under half a
    # pitch (they coincide exactly ON the edge; the deviation grows with
    # distance, which is why a coarse-res derivation mis-rounds)
    res = 4
    unit = 49  # 7 ** (res // 2)
    max_dim = 2 * unit
    # mid-edge directions only (balanced ratios): near-corner crossings
    # sit close to TWO neighbor faces and mis-round first
    quads = {
        "IJ": [(2, 1), (3, 2), (1, 1), (2, 3), (1, 2), (3, 4), (4, 3)],
        "KI": [(1, -2), (1, -3), (0, -1), (2, -3), (1, -1), (2, -5),
               (3, -4)],
        "JK": [(-2, 1), (-3, 1), (-1, 0), (-3, 2), (-2, 2), (-5, 2),
               (-4, 3)],
    }
    for f in range(20):
        for q, dirs in quads.items():
            samples = []
            for da, db in dirs:
                # scale the direction JUST past the face edge (i+j+k is
                # the overage measure: land in (maxDim, maxDim + step])
                ku = -min(da, db, 0)
                s_unit = da + db + 3 * ku
                if s_unit <= 0:
                    continue
                m = max_dim // s_unit + 1
                a, b = da * m, db * m
                k = -min(a, b, 0)
                i, j = a + k, b + k
                if i + j + k <= max_dim:
                    continue
                in_q = (k > 0 and j > 0 and q == "JK") or \
                    (k > 0 and j == 0 and q == "KI") or \
                    (k == 0 and q == "IJ")
                if not in_q:
                    continue
                x, y = _ax_to_hex2d(np.array([a]), np.array([b]))
                lat, lng = _hex2d_to_latlng(
                    np.array([f]), x, y, np.array([res])
                )
                gface, gx, gy = latlng_to_face_hex2d(
                    np.rad2deg(lat), np.rad2deg(lng), res
                )
                gi, gj, gk = _hex2d_to_coord_ij(gx, gy)
                if int(gface[0]) == f:
                    continue  # not actually past the edge
                samples.append(
                    ((a, b), int(gface[0]),
                     (int(gi[0] - gk[0]), int(gj[0] - gk[0])))
                )
            faces = {s[1] for s in samples}
            if len(faces) != 1 or len(samples) < 3:
                raise AssertionError(
                    f"face-neighbor derivation failed for ({f}, {q}): "
                    f"{len(samples)} samples over faces {faces}"
                )
            g = samples[0][1]
            solved = None
            for rot in range(6):
                ta = tb = None
                okall = True
                for (a, b), _, (ga, gb) in samples:
                    ra, rb = a, b
                    for _ in range(rot):
                        ra, rb = _rot60ccw(ra, rb)
                    da_, db_ = ga - ra, gb - rb
                    if ta is None:
                        ta, tb = da_, db_
                    elif (ta, tb) != (da_, db_):
                        okall = False
                        break
                if okall and ta % unit == 0 and tb % unit == 0:
                    solved = (g, rot, (ta // unit, tb // unit))
                    break
            if solved is None:
                raise AssertionError(
                    f"face-neighbor gluing unsolvable for ({f}, {q})"
                )
            out[(f, q)] = solved
    return out


def _face_neighbors():
    global _FN_CACHE
    if _FN_CACHE is None:
        _FN_CACHE = _derive_face_neighbors()
    return _FN_CACHE


# --- overage adjustment (faceijk.c _adjustOverageClassII shape) ---------

def _adjust_overage(face, a, b, res, pent_leading4=None, substrate=False):
    """Vectorized Class-II overage adjustment: coordinates past the face
    triangle (i + j + k > maxDim) are re-expressed in the neighboring
    face's frame via the derived gluing. Returns (face, a, b, overage)
    with overage True where a face hop happened."""
    fn = _face_neighbors()
    face = face.copy()
    a = a.copy()
    b = b.copy()
    unit = 7 ** (int(res) // 2)
    max_dim = 2 * unit
    if substrate:
        max_dim *= 3
        unit *= 3
    k = -np.minimum(np.minimum(a, b), 0)
    i, j = a + k, b + k
    over = (i + j + k) > max_dim
    if not over.any():
        return face, a, b, over
    idx = np.flatnonzero(over)
    for t in idx:
        fa, aa, bb = int(face[t]), int(a[t]), int(b[t])
        kk = -min(aa, bb, 0)
        ii, jj = aa + kk, bb + kk
        if kk > 0:
            if jj > 0:
                q = "JK"
            else:
                q = "KI"
                if pent_leading4 is not None and pent_leading4[t]:
                    # pentagon leading-4: rotate about the pentagon
                    # center (maxDim, 0) before the hop
                    # (h3 _adjustOverageClassII pentLeading4 branch)
                    ra, rb = _rot60cw(aa - max_dim, bb)
                    aa, bb = ra + max_dim, rb
        else:
            q = "IJ"
        g, rot, (ta, tb) = fn[(fa, q)]
        for _ in range(rot):
            aa, bb = _rot60ccw(aa, bb)
        a[t] = aa + ta * unit
        b[t] = bb + tb * unit
        face[t] = g
    return face, a, b, over


# --- inverse walk: h -> (face, axial ijk) -------------------------------

def _leading_digit(h, res):
    lead = np.zeros(len(h), dtype=np.int64)
    for r in range(1, MAX_RES + 1):
        d = (h >> (45 - 3 * r)) & 0x7
        d = np.where(r <= res, d, 0)
        lead = np.where((lead == 0) & (d != 0), d, lead)
    return lead


def _rotate60cw_id(h, res):
    """h3Index.c _h3Rotate60cw: rotate every resolution digit cw."""
    out = h.copy()
    for r in range(1, MAX_RES + 1):
        sh = 45 - 3 * r
        m = r <= res
        d = np.where(m, (h >> sh) & 0x7, 0)  # pad digits are 7
        nd = _CW_DIGIT[d]
        out = np.where(
            m, (out & ~(np.int64(0x7) << sh)) | (nd << sh), out
        )
    return out


def h3_to_faceijk(h):
    """Vectorized inverse of the forward id computation (h3Index.c
    _h3ToFaceIjk shape): base-cell home + per-res aperture-7 down +
    digit neighbor step, pentagon leading-5 rotation, Class-II overage
    adjustment with pentagon leading-4 handling and pentagon multi-hop.
    Returns (face, a, b) axial at the cell's own resolution."""
    h = np.asarray(h, dtype=np.int64)
    res = cell_resolution(h)
    bc = cell_base(h)
    pent = _BC_PENT[bc]
    lead = _leading_digit(h, res)
    h = np.where(pent & (lead == 5), _rotate60cw_id(h, res), h)

    face = _BC_FACE[bc].copy()
    a = _BC_HOME_A[bc].copy()
    b = _BC_HOME_B[bc].copy()
    max_res = int(res.max()) if len(res) else 0
    for r in range(1, max_res + 1):
        m = r <= res
        da7, db7 = _down_ap7_ax(a, b)
        dr7, drb7 = _down_ap7r_ax(a, b)
        na, nb = (da7, db7) if r % 2 == 1 else (dr7, drb7)
        d = (h >> (45 - 3 * r)) & 0x7
        na = na + _DIGIT_A[d]
        nb = nb + _DIGIT_B[d]
        a = np.where(m, na, a)
        b = np.where(m, nb, b)

    if not len(h):
        return face, a, b
    # per-res overage adjustment must run at a single res per batch
    out_f = np.empty_like(face)
    out_a = np.empty_like(a)
    out_b = np.empty_like(b)
    for rv in np.unique(res):
        sel = np.flatnonzero(res == rv)
        f_s, a_s, b_s = face[sel], a[sel], b[sel]
        adj_res = int(rv)
        orig_a, orig_b = a_s.copy(), b_s.copy()
        if adj_res % 2 == 1:  # Class III: drop into finer Class II grid
            a_s, b_s = _down_ap7r_ax(a_s, b_s)
            adj_res += 1
        p4 = pent[sel] & (lead[sel] == 4)
        f_s, a_s, b_s, over = _adjust_overage(
            f_s, a_s, b_s, adj_res, pent_leading4=p4
        )
        # pentagons can hop more than one face
        redo = over & pent[sel]
        while redo.any():
            f_s2, a_s2, b_s2, over2 = _adjust_overage(
                f_s[redo], a_s[redo], b_s[redo], adj_res
            )
            f_s[redo], a_s[redo], b_s[redo] = f_s2, a_s2, b_s2
            nxt = np.zeros_like(redo)
            nxt[np.flatnonzero(redo)] = over2
            redo = nxt
        if int(rv) % 2 == 1:
            # overage happened in the finer Class II grid: scale back up;
            # where there was no overage the original coords are exact
            ua, ub = _up_ap7r_ax(a_s, b_s)
            a_s = np.where(over, ua, orig_a)
            b_s = np.where(over, ub, orig_b)
        out_f[sel], out_a[sel], out_b[sel] = f_s, a_s, b_s
    return out_f, out_a, out_b


def cell_to_latlng(h):
    """Vectorized h3 cellToLatLng: inverse walk + inverse gnomonic.
    Returns (lat_deg, lng_deg)."""
    h = np.asarray(h, dtype=np.int64)
    res = cell_resolution(h)
    face, a, b = h3_to_faceijk(h)
    x, y = _ax_to_hex2d(a, b)
    lat, lng = _hex2d_to_latlng(face, x, y, res)
    return np.rad2deg(lat), np.rad2deg(lng)


# --- neighborhoods ------------------------------------------------------

_NEIGH_AX = np.array(
    [(1, 0), (1, 1), (0, 1), (-1, 0), (-1, -1), (0, -1)], dtype=np.int64
)


def _neighbor_candidates(h):
    """(n, 6) candidate neighbor ids: forward-mapped centers of the 6
    surrounding lattice positions in each cell's own face frame. The
    forward path resolves face crossings and pentagon digit adjustments
    itself; candidates may contain duplicates / the origin near
    pentagons (filtered by the caller)."""
    h = np.asarray(h, dtype=np.int64)
    n = len(h)
    if not n:
        return np.empty((0, 6), dtype=np.int64)
    res = cell_resolution(h)
    if not (res == res[0]).all():
        raise ValueError("grid_disk input must share one resolution")
    rv = int(res[0])
    face, a, b = h3_to_faceijk(h)
    fr = np.repeat(face, 6)
    ar = np.repeat(a, 6) + np.tile(_NEIGH_AX[:, 0], n)
    br = np.repeat(b, 6) + np.tile(_NEIGH_AX[:, 1], n)
    x, y = _ax_to_hex2d(ar, br)
    lat, lng = _hex2d_to_latlng(fr, x, y, np.full(len(fr), rv))
    ids = latlng_to_cell(
        np.rad2deg(lat), np.rad2deg(lng), rv, on_invalid="null"
    )
    return ids.reshape(n, 6)


def neighbors(h):
    """Exact H3 adjacency: per input cell, the list of its neighbors
    (6 for hexagons, 5 for pentagons). A candidate is kept only when
    adjacency is MUTUAL — this removes the pentagon-distortion artifacts
    a one-sided geometric step can produce."""
    h = np.asarray(h, dtype=np.int64)
    cand = _neighbor_candidates(h)
    flat = np.unique(cand[(cand != 0)])
    back = _neighbor_candidates(flat)
    # mutual: cand[i, j] is a neighbor of h[i] iff h[i] in back[cand_row]
    pos = {int(c): t for t, c in enumerate(flat)}
    out = []
    for i in range(len(h)):
        mine = []
        for j in range(6):
            c = int(cand[i, j])
            if c == 0 or c == int(h[i]) or c in mine:
                continue
            if int(h[i]) in back[pos[c]]:
                mine.append(c)
        out.append(mine)
    return out


def grid_disk_distances(h, k: int) -> list[tuple[int, int]]:
    """H3 gridDiskDistances(h, k): (cell, grid_distance) pairs for all
    cells within GRID distance k, sorted by cell id (BFS on the exact
    adjacency graph — matches gridDiskDistancesSafe semantics, including
    around pentagons). The single ring-BFS implementation — ``grid_disk``
    and operators/tile.h3_disk_expand both derive from it."""
    h = int(h)
    seen = {h: 0}
    frontier = np.array([h], dtype=np.int64)
    for dist in range(1, k + 1):
        if not len(frontier):
            break
        nxt = {c for lst in neighbors(frontier) for c in lst if c not in seen}
        for c in nxt:
            seen[c] = dist
        frontier = np.fromiter(nxt, dtype=np.int64, count=len(nxt))
    return sorted(seen.items())


def grid_disk(h, k: int):
    """H3 gridDisk(h, k): all cells within GRID distance k; sorted int64
    array (1 + 3k(k+1) cells away from pentagon distortion)."""
    pairs = grid_disk_distances(h, k)
    return np.fromiter((c for c, _ in pairs), dtype=np.int64, count=len(pairs))


# --- boundaries ---------------------------------------------------------

# substrate (aperture 3,3r) vertex offsets of an origin-centered cell,
# Class II / Class III (faceijk.c vertsCII / vertsCIII), in axial coords
_VERTS_CII_AX = np.array(
    [(2, 1), (1, 2), (-1, 1), (-2, -1), (-1, -2), (1, -1)], dtype=np.int64
)
_VERTS_CIII_AX = np.array(
    [(5, 4), (1, 5), (-4, 1), (-5, -4), (-1, -5), (4, -1)], dtype=np.int64
)


def cell_to_boundary(h: int):
    """Exact spherical vertex set of one cell (lat_deg, lng_deg) pairs,
    counter-clockwise: center lifted onto the aperture-33r substrate
    grid, the 6 published vertex offsets added, each vertex overage-
    adjusted in SUBSTRATE mode onto its own face, then inverse-projected
    (faceijk.c _faceIjkToVerts / _faceIjkToCellBoundary shapes; Class III
    fold-distortion vertices are not inserted — module docstring).
    Pentagons (5 vertices) are derived from their neighbors' boundaries:
    a pentagon vertex is exactly a shared vertex of two adjacent
    neighbor hexagons."""
    h = int(h)
    hv = np.array([h], dtype=np.int64)
    if bool(_BC_PENT[cell_base(hv)][0]) and not (
        _leading_digit(hv, cell_resolution(hv))[0]
    ):
        nbrs = neighbors(hv)[0]
        clat, clng = cell_to_latlng(hv)
        verts: list[tuple[float, float]] = []
        for t, n1 in enumerate(nbrs):
            b1 = cell_to_boundary(n1)
            for n2 in nbrs[t + 1:]:
                b2 = cell_to_boundary(n2)
                for v1 in b1:
                    for v2 in b2:
                        if abs(v1[0] - v2[0]) < 1e-9 and \
                                abs(v1[1] - v2[1]) < 1e-9:
                            if not any(
                                abs(v1[0] - w[0]) < 1e-9
                                and abs(v1[1] - w[1]) < 1e-9
                                for w in verts
                            ):
                                verts.append((v1[0], v1[1]))
        # keep the 5 closest shared vertices (neighbor pairs meeting
        # away from the pentagon share far vertices too); use 3D chord
        # distance + a local tangent frame — lat/lng arithmetic breaks at
        # the two polar pentagons
        def unit(latd, lngd):
            la, lo = math.radians(latd), math.radians(lngd)
            return np.array([
                math.cos(la) * math.cos(lo),
                math.cos(la) * math.sin(lo),
                math.sin(la),
            ])

        c3 = unit(float(clat[0]), float(clng[0]))
        east = np.cross([0.0, 0.0, 1.0], c3)
        east = east / np.linalg.norm(east) if np.linalg.norm(east) > 1e-12 \
            else np.array([1.0, 0.0, 0.0])
        north = np.cross(c3, east)
        v3 = [unit(v[0], v[1]) for v in verts]
        order = sorted(
            range(len(verts)), key=lambda t: -float(v3[t] @ c3)
        )[:5]
        order.sort(
            key=lambda t: math.atan2(
                float(v3[t] @ north), float(v3[t] @ east)
            )
        )
        return np.array([verts[t] for t in order], dtype=np.float64)

    res = int(cell_resolution(hv)[0])
    face, a, b = h3_to_faceijk(hv)
    # lift the center onto the aperture 3,3r substrate grid
    a2, b2 = _down_ap3_ax(a, b)
    a2, b2 = _down_ap3r_ax(a2, b2)
    adj_res = res
    if res % 2 == 1:  # Class III: one finer cw aperture 7
        a2, b2 = _down_ap7r_ax(a2, b2)
        adj_res += 1
        offs = _VERTS_CIII_AX
    else:
        offs = _VERTS_CII_AX
    vf = np.repeat(face, 6)
    va = np.repeat(a2, 6) + offs[:, 0]
    vb = np.repeat(b2, 6) + offs[:, 1]
    # substrate overage: vertices past the face edge project from the
    # neighboring face's frame; loop for multi-hop safety
    for _ in range(3):
        vf, va, vb, over = _adjust_overage(
            vf, va, vb, adj_res, substrate=True
        )
        if not over.any():
            break
    x, y = _ax_to_hex2d(va, vb)
    lat, lng = _hex2d_to_latlng(
        vf, x, y, np.full(6, adj_res), substrate=True
    )
    return np.column_stack([np.rad2deg(lat), np.rad2deg(lng)])


# --- polygon covers (polyfill) ------------------------------------------

# circumradius of a unit-lattice hexagon cell in its res-scaled hex2d
# plane (centers form the unit triangular lattice: neighbor spacing 1,
# Voronoi hexagon inradius 1/2, circumradius 1/sqrt(3))
HEX_CIRCUMRADIUS = 1.0 / math.sqrt(3.0)
# strictly larger than any double rounding error at O(1) coordinates and
# strictly smaller than any geometric feature the tests use: FULL cells
# keep this much clearance from the ring, so the exact per-point ray
# cast provably agrees with the cover's full-cell accept
_POLYFILL_MARGIN = 1e-6
# the 6 axial neighbor steps of the unit lattice (center diffs of
# length exactly 1 under x = a - b/2, y = b*sin60)
_AX_NB = np.array(
    [[1, 0], [-1, 0], [0, 1], [0, -1], [1, 1], [-1, -1]], dtype=np.int64
)


def hex2d_to_axial(x, y):
    """Axial lattice coords (a = i - k, b = j - k) of the cell containing
    each res-scaled hex2d point — the same hex-grid rounding the gated
    forward path uses (functions/h3._hex2d_to_coord_ij), so polyfill
    covers and per-point cell assignment can never disagree about which
    cell a point is in."""
    i, j, k = _hex2d_to_coord_ij(
        np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    )
    return i - k, j - k


def _ring_min_dist(px, py, ring):
    """Min distance from each point to any segment of the closed ring —
    vectorized (n_points, n_edges) without a Python loop over points."""
    v0 = ring
    v1 = np.roll(ring, -1, axis=0)
    ex = (v1[:, 0] - v0[:, 0])[None, :]
    ey = (v1[:, 1] - v0[:, 1])[None, :]
    wx = px[:, None] - v0[None, :, 0]
    wy = py[:, None] - v0[None, :, 1]
    ee = ex * ex + ey * ey
    t = np.clip((wx * ex + wy * ey) / np.where(ee > 0.0, ee, 1.0), 0.0, 1.0)
    dx = wx - t * ex
    dy = wy - t * ey
    return np.sqrt((dx * dx + dy * dy).min(axis=1))


def hex2d_polyfill(ring, max_cells: int = 1_000_000):
    """Cover of a simple closed ring (hex2d plane, res scaling) by unit-
    lattice cells: axial coords + flags, BFS over the exact adjacency.

    Returns ``(a, b, center_in, is_full)`` int64/bool arrays over the
    COVER = every cell intersecting the ring's closed region (plus a
    conservative ≤1-cell band around the boundary):

    - ``is_full``  — the cell lies ENTIRELY inside the ring (center
      inside and every ring edge farther than circumradius + margin):
      points in it need no exact test;
    - ``center_in`` — H3 polygonToCells center-containment semantics;
    - cells in the cover with ``is_full`` False are the boundary band:
      membership of their points needs the exact per-point ray cast.

    Completeness (why a point inside the ring can never land outside the
    cover): its cell either has its center inside (→ cover) or the
    segment center→point crosses the ring, putting a ring edge within
    circumradius of the center (→ band). Connectivity (why BFS finds the
    whole cover): cells intersecting a connected region are vertex-
    connected, and on a hex tiling vertex-connected ⇒ edge-connected
    (any two of the three cells at a vertex share an edge); band extras
    sit within 2·circumradius + margin < √3 (the next-nearest-center
    distance) of a ring-intersecting cell, i.e. adjacent to the BFS set.
    ``max_cells`` is the runaway guard for degenerate rings (same spirit
    as the LSH oversized-bucket guard): raises rather than flooding.
    """
    from linear_kdtree_spark.functions.geometry import raycast_numpy

    ring = np.asarray(ring, dtype=np.float64)
    if ring.ndim != 2 or len(ring) < 3:
        raise ValueError("ring must be (m >= 3, 2) vertices")
    r_band = HEX_CIRCUMRADIUS + _POLYFILL_MARGIN
    seeds_x = np.concatenate([ring[:, 0], ring[:, 0:1].mean(axis=0)])
    seeds_y = np.concatenate([ring[:, 1], ring[:, 1:2].mean(axis=0)])
    sa, sb = hex2d_to_axial(seeds_x, seeds_y)
    frontier = {(int(a), int(b)) for a, b in zip(sa, sb)}
    visited: set[tuple[int, int]] = set()
    out_a, out_b, out_cin, out_full = [], [], [], []
    while frontier:
        batch = np.array(sorted(frontier), dtype=np.int64)
        visited |= frontier
        if len(visited) > max_cells:
            raise ValueError(
                f"polyfill cover exceeds max_cells={max_cells} "
                "(degenerate ring?)"
            )
        cx, cy = _ax_to_hex2d(batch[:, 0], batch[:, 1])
        inside = raycast_numpy(cx, cy, ring)
        mind = _ring_min_dist(cx, cy, ring)
        near = mind <= r_band
        cover = inside | near
        out_a.append(batch[cover, 0])
        out_b.append(batch[cover, 1])
        out_cin.append(inside[cover])
        out_full.append(inside[cover] & ~near[cover])
        grow = batch[cover]
        nxt = (grow[:, None, :] + _AX_NB[None, :, :]).reshape(-1, 2)
        frontier = {
            (int(a), int(b)) for a, b in nxt
        } - visited
    return (
        np.concatenate(out_a) if out_a else np.empty(0, dtype=np.int64),
        np.concatenate(out_b) if out_b else np.empty(0, dtype=np.int64),
        np.concatenate(out_cin) if out_cin else np.empty(0, dtype=bool),
        np.concatenate(out_full) if out_full else np.empty(0, dtype=bool),
    )


def polygon_to_cells(ring_latlng, res: int, cover: bool = False):
    """H3 polyfill (polygonToCells shape) from scratch: the cells at
    ``res`` whose center lies inside the lat/lng ring.

    Edge semantics, documented divergence from reference H3: ring edges
    are straight lines in the face's GNOMONIC hex2d plane — i.e. exact
    GEODESICS on the sphere (the gnomonic projection maps great circles
    to straight lines) — where reference H3's polygonToCells treats
    edges as straight in lat/lng coordinates (polygon.c ray cast).
    Results differ only for cell centers within the tiny edge-bulge
    distance between a geodesic and its lat/lng chord.

    Single-face rings only (all vertices must project to one icosahedron
    face): multi-face rings raise NotImplementedError — the documented
    boundary, same style as the JPEG/MP3 codec boundaries; callers can
    split large polygons along face edges.

    ``cover=True`` returns ``(cells, is_full)`` over the full cover
    (boundary band included) for exact point-in-polygon composition;
    default returns only the center-inside cells (H3 parity).
    """
    from linear_kdtree_spark.functions.h3 import face_hex2d_to_cell

    ring = np.asarray(ring_latlng, dtype=np.float64)
    face, x, y = latlng_to_face_hex2d(ring[:, 0], ring[:, 1], res)
    if len(np.unique(face)) != 1:
        raise NotImplementedError(
            "polygon_to_cells: ring spans multiple icosahedron faces; "
            "split the ring along face edges"
        )
    a, b, cin, full = hex2d_polyfill(np.column_stack([x, y]))
    cx, cy = _ax_to_hex2d(a, b)
    cells = face_hex2d_to_cell(
        np.full(len(cx), face[0], dtype=np.int64), cx, cy, res,
        on_invalid="null",
    )
    ok = cells != 0  # beyond-coverage sentinel (overage past the face)
    if cover:
        return cells[ok], full[ok]
    keep = cin & ok
    return cells[keep]
