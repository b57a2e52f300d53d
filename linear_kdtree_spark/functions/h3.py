"""True Uber-H3 cell ids, from scratch on the published spec constants.

The reference engine (rob05c/linear-kdtree, lkt.h:34-45) has no tiling
surface; H3 ids are part of this engine's mandated "H3/S2 tile
assignment" query surface (SURVEY.md §2.3-Q3).  Everything here is
implemented from the PUBLIC H3 spec: the icosahedron orientation,
base-cell table and algorithm shapes published at h3geo.org / uber/h3
(Apache-2.0).  The 122-entry ``BASE_CELL_DATA`` and face-orientation
constants are vendored with citation in ``h3_tables.py``; the
``faceIjkBaseCells`` lookup is DERIVED from them by
``tools/h3_tablegen.py`` (geometric matching + pentagon boundary-glue
solving) rather than copied.

Two layers, split exactly like functions/s2.py and functions/hexgrid.py:

- trig front-end ``latlng_to_face_hex2d`` (nearest icosahedron face,
  azimuth, gnomonic scaling, aperture-7 Class-III rotation) —
  pytest-pinned against published example cells; trig is not
  bit-reproducible across engines.
- trig-free int core ``face_hex2d_to_cell`` (hex-grid rounding,
  aperture-7 up-aggregation, base-cell lookup, rotation/pentagon digit
  adjustments, id packing) — pure int arithmetic plus identically-
  written double mul/add/compare, driver-gated bit-exactly against a
  DuckDB oracle (entry.py::tile_h3_oracle_sql).

All functions are vectorized numpy over Arrow batches; ``*_scalar``
twins (pure python) are the tests' independent cross-checks.
"""

from __future__ import annotations

import math

import numpy as np

from linear_kdtree_spark.functions.h3_tables import (
    BASE_CELL_DATA,
    FACE_AXES_AZ_RADS_CII,
    FACE_CENTER_GEO,
    PENTAGONS,
)

MAX_RES = 15
M_SQRT7 = 2.6457513110645905905016157536392604257102
# res-0 unit distance (gnomonic) — faceijk.c::RES0_U_GNOMONIC
RES0_U_GNOMONIC = 0.38196601125010500003
# rotation between Class II and Class III resolutions: asin(sqrt(3/28))
M_AP7_ROT_RADS = 0.333473172251832115336090755351601070065900389
SIN60 = 0.8660254037844386467637231707529361834714  # sqrt(3)/2
M_2PI = 2.0 * math.pi

# digit <-> unit ijk: digit = 4i + 2j + k (coordijk.c UNIT_VECS order:
# CENTER, K, J, JK, I, IK, IJ)
K_DIGIT = 1
# 60 deg rotations of a digit (coordijk.c _rotate60ccw/_rotate60cw)
CCW_DIGIT = np.array([0, 5, 3, 1, 6, 4, 2], dtype=np.int64)
CW_DIGIT = np.array([0, 3, 6, 2, 5, 1, 4], dtype=np.int64)

_BC_FACE = np.array([d[0] for d in BASE_CELL_DATA], dtype=np.int64)
_BC_PENT = np.array([d[2] for d in BASE_CELL_DATA], dtype=bool)
_BC_CW_OFF = np.array([d[3] for d in BASE_CELL_DATA], dtype=np.int64)

_FACE_LAT = np.array([g[0] for g in FACE_CENTER_GEO])
_FACE_LNG = np.array([g[1] for g in FACE_CENTER_GEO])
_FACE_AZ0 = np.array([a[0] for a in FACE_AXES_AZ_RADS_CII])
_FACE_XYZ = np.stack(
    [np.cos(_FACE_LAT) * np.cos(_FACE_LNG),
     np.cos(_FACE_LAT) * np.sin(_FACE_LNG),
     np.sin(_FACE_LAT)],
    axis=1,
)


def _load_table():
    """(bc, rot) lookup arrays [20, 3, 3, 3], from the generated module."""
    from linear_kdtree_spark.functions._h3_table_generated import (
        FACE_IJK_BASE_CELLS,
    )

    bc = np.empty((20, 3, 3, 3), dtype=np.int64)
    rot = np.empty((20, 3, 3, 3), dtype=np.int64)
    for f in range(20):
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    bc[f, i, j, k], rot[f, i, j, k] = (
                        FACE_IJK_BASE_CELLS[f][i][j][k]
                    )
    return bc, rot


_TABLE = None


def _table():
    global _TABLE
    if _TABLE is None:
        _TABLE = _load_table()
    return _TABLE


# --- trig front-end ---------------------------------------------------

def latlng_to_face_hex2d(lat_deg, lng_deg, res: int):
    """(face, x, y): nearest icosahedron face + res-scaled hex2d coords
    (faceijk.c::_geoToHex2d): azimuth from the face's published i-axis,
    Class-III aperture-7 rotation, inverse-gnomonic tan scaling."""
    lat = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    lng = np.deg2rad(np.asarray(lng_deg, dtype=np.float64))
    cl = np.cos(lat)
    p = np.stack([cl * np.cos(lng), cl * np.sin(lng), np.sin(lat)], axis=1)
    # nearest face = min squared distance (first minimum wins)
    sqd = ((p[:, None, :] - _FACE_XYZ[None, :, :]) ** 2).sum(axis=2)
    face = np.argmin(sqd, axis=1)
    d = sqd[np.arange(len(p)), face]
    r = np.arccos(np.clip(1.0 - d / 2.0, -1.0, 1.0))
    # azimuth face center -> point
    flat = _FACE_LAT[face]
    flng = _FACE_LNG[face]
    az = np.arctan2(
        np.cos(lat) * np.sin(lng - flng),
        np.cos(flat) * np.sin(lat)
        - np.sin(flat) * np.cos(lat) * np.cos(lng - flng),
    )
    theta = _pos_angle(_FACE_AZ0[face] - _pos_angle(az))
    if res % 2 == 1:  # Class III
        theta = _pos_angle(theta - M_AP7_ROT_RADS)
    rr = np.tan(r) / RES0_U_GNOMONIC * (M_SQRT7 ** res)
    small = r < 1e-16
    x = np.where(small, 0.0, rr * np.cos(theta))
    y = np.where(small, 0.0, rr * np.sin(theta))
    return face.astype(np.int64), x, y


def _pos_angle(a):
    a = np.remainder(a, M_2PI)
    return a


# --- trig-free core ---------------------------------------------------

def _hex2d_to_coord_ij(x, y):
    """Hex-grid rounding (coordijk.c::_hexbin2dToCoordIJK shape): double
    compares/adds + int truncation only — bit-reproducible."""
    a1 = np.abs(x)
    a2 = np.abs(y)
    x2 = a2 / SIN60
    x1 = a1 + x2 / 2.0
    m1 = x1.astype(np.int64)
    m2 = x2.astype(np.int64)
    r1 = x1 - m1
    r2 = x2 - m2

    i = np.empty_like(m1)
    j = np.empty_like(m2)

    b1 = r1 < 0.5
    b2 = r1 < (1.0 / 3.0)
    c1 = r2 < (1.0 + r1) / 2.0
    c2 = r2 < (1.0 - r1)
    c3 = (1.0 - r1) <= r2
    c4 = r2 < (2.0 * r1)
    b3 = r1 < (2.0 / 3.0)
    c5 = (2.0 * r1 - 1.0) < r2
    c6 = r2 < r1 / 2.0

    # r1 < 1/3
    i = np.where(b1 & b2, m1, 0)
    j = np.where(b1 & b2, np.where(c1, m2, m2 + 1), 0)
    # 1/3 <= r1 < 1/2
    m = b1 & ~b2
    i = np.where(m, np.where(c3 & c4, m1 + 1, m1), i)
    j = np.where(m, np.where(c2, m2, m2 + 1), j)
    # 1/2 <= r1 < 2/3
    m = ~b1 & b3
    i = np.where(m, np.where(c5 & c2, m1, m1 + 1), i)
    j = np.where(m, np.where(c2, m2, m2 + 1), j)
    # r1 >= 2/3
    m = ~b1 & ~b3
    i = np.where(m, m1 + 1, i)
    j = np.where(m, np.where(c6, m2, m2 + 1), j)

    # fold across the axes
    neg_x = x < 0.0
    even_j = (j % 2) == 0
    axis_i = np.where(even_j, j // 2, (j + 1) // 2)
    diff = i - axis_i
    i = np.where(neg_x, np.where(even_j, i - 2 * diff, i - (2 * diff + 1)),
                 i)
    neg_y = y < 0.0
    i = np.where(neg_y, i - (2 * j + 1) // 2, i)
    j = np.where(neg_y, -j, j)
    return _ijk_normalize(i, j, np.zeros_like(i))


def _ijk_normalize(i, j, k):
    neg = i < 0
    j = np.where(neg, j - i, j)
    k = np.where(neg, k - i, k)
    i = np.where(neg, 0, i)
    neg = j < 0
    i = np.where(neg, i - j, i)
    k = np.where(neg, k - j, k)
    j = np.where(neg, 0, j)
    neg = k < 0
    i = np.where(neg, i - k, i)
    j = np.where(neg, j - k, j)
    k = np.where(neg, 0, k)
    m = np.minimum(np.minimum(i, j), k)
    return i - m, j - m, k - m


def _lround_div7(a):
    """lround(a / 7.0) on int arrays, exactly: a/7 never lands on .5, so
    round-half-any == floor((2a + 7) / 14) (floor division)."""
    return (2 * a + 7) // 14


def _up_ap7(i, j, k):
    di = i - k
    dj = j - k
    ni = _lround_div7(3 * di - dj)
    nj = _lround_div7(di + 2 * dj)
    return _ijk_normalize(ni, nj, np.zeros_like(ni))


def _up_ap7r(i, j, k):
    di = i - k
    dj = j - k
    ni = _lround_div7(2 * di + dj)
    nj = _lround_div7(3 * dj - di)
    return _ijk_normalize(ni, nj, np.zeros_like(ni))


def _down_ap7(i, j, k):
    # iVec {3,0,1} jVec {1,3,0} kVec {0,1,3}
    ni = 3 * i + 1 * j + 0 * k
    nj = 0 * i + 3 * j + 1 * k
    nk = 1 * i + 0 * j + 3 * k
    return _ijk_normalize(ni, nj, nk)


def _down_ap7r(i, j, k):
    # iVec {3,1,0} jVec {0,3,1} kVec {1,0,3}
    ni = 3 * i + 0 * j + 1 * k
    nj = 1 * i + 3 * j + 0 * k
    nk = 0 * i + 1 * j + 3 * k
    return _ijk_normalize(ni, nj, nk)


def face_hex2d_to_cell(face, x, y, res: int, table=None,
                       on_invalid: str = "raise"):
    """int64 H3 ids from (face, hex2d x, y at ``res`` scaling) — the
    trig-free gated core: hex rounding, aperture-7 up-aggregation with
    exact integer lround-by-7, base-cell lookup, rotations, pentagon
    leading-K adjustment, id packing (h3Index.c::_faceIjkToH3 shape).

    ``on_invalid``: coordinates beyond the face coverage region either
    ``"raise"`` (library default — loud for the scalar/test path) or map
    to ``"null"`` → sentinel 0, reference H3's H3_NULL, so one bad row
    cannot fail a whole Spark job (ADVICE r4); callers filter ``== 0``."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    face = np.asarray(face, dtype=np.int64)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    bc_tab, rot_tab = table if table is not None else _table()

    i, j, k = _hex2d_to_coord_ij(x, y)
    n = len(face)
    digits = np.zeros((n, res), dtype=np.int64)
    for r in range(res, 0, -1):
        li, lj, lk = i, j, k
        if r % 2 == 1:  # Class III
            i, j, k = _up_ap7(i, j, k)
            ci, cj, ck = _down_ap7(i, j, k)
        else:
            i, j, k = _up_ap7r(i, j, k)
            ci, cj, ck = _down_ap7r(i, j, k)
        di, dj, dk = _ijk_normalize(li - ci, lj - cj, lk - ck)
        digits[:, r - 1] = 4 * di + 2 * dj + dk

    invalid = (i > 2) | (j > 2) | (k > 2)
    if np.any(invalid):
        if on_invalid == "raise":
            bad = np.where(invalid)[0][:3]
            raise ValueError(
                f"coordinates out of base-cell range (rows {bad.tolist()}):"
                " input beyond the face coverage region"
            )
        # sentinel path: neutralize bad rows so the table lookups stay in
        # bounds, then zero their ids at the end
        i = np.where(invalid, 0, i)
        j = np.where(invalid, 0, j)
        k = np.where(invalid, 0, k)
    bc = bc_tab[face, i, j, k]
    rot = rot_tab[face, i, j, k]

    pent = _BC_PENT[bc]
    if res > 0:
        nz = digits != 0
        has_nz = nz.any(axis=1)
        lead_pos = np.where(has_nz, nz.argmax(axis=1), 0)
        lead = np.where(has_nz, digits[np.arange(n), lead_pos], 0)
        # pentagon: force rotation out of the deleted K-axes sub-sequence
        adj = pent & (lead == K_DIGIT)
        if adj.any():
            cw = adj & (
                (_BC_CW_OFF[bc, 0] == face) | (_BC_CW_OFF[bc, 1] == face)
            )
            ccw = adj & ~cw
            digits[cw] = CW_DIGIT[digits[cw]]
            digits[ccw] = CCW_DIGIT[digits[ccw]]
        # apply the base-cell rotations
        hexr = ~pent
        if hexr.any():
            # CCW^rot as one composed per-row lookup
            pow_tab = np.empty((6, 7), dtype=np.int64)
            pow_tab[0] = np.arange(7)
            for p in range(1, 6):
                pow_tab[p] = CCW_DIGIT[pow_tab[p - 1]]
            digits[hexr] = pow_tab[rot[hexr][:, None],
                                   digits[hexr]]
        if pent.any():
            prows = np.where(pent)[0]
            prot = rot[prows].copy()
            for _ in range(int(prot.max()) if len(prot) else 0):
                act = prot > 0
                rows = prows[act]
                if not len(rows):
                    break
                digits[rows] = CCW_DIGIT[digits[rows]]
                # adjust for the deleted k-axes sequence
                dnz = digits[rows] != 0
                dhas = dnz.any(axis=1)
                dpos = np.where(dhas, dnz.argmax(axis=1), 0)
                dlead = np.where(
                    dhas, digits[rows, dpos], 0
                )
                kk = rows[dlead == K_DIGIT]
                if len(kk):
                    digits[kk] = CCW_DIGIT[digits[kk]]
                prot[act] -= 1

    h = (np.int64(1) << 59) | (np.int64(res) << 52) | (bc << 45)
    for r in range(1, res + 1):
        h = h | (digits[:, r - 1] << (45 - 3 * r))
    for r in range(res + 1, MAX_RES + 1):
        h = h | (np.int64(7) << (45 - 3 * r))
    if on_invalid != "raise" and np.any(invalid):
        h = np.where(invalid, np.int64(0), h)
    return h


def latlng_to_cell(lat_deg, lng_deg, res: int, table=None,
                   on_invalid: str = "raise"):
    """Vectorized latLngToCell: trig front-end + trig-free core."""
    face, x, y = latlng_to_face_hex2d(lat_deg, lng_deg, res)
    return face_hex2d_to_cell(face, x, y, res, table=table,
                              on_invalid=on_invalid)


def latlng_to_cell_scalar(lat_deg: float, lng_deg: float, res: int,
                          table=None) -> int:
    """Scalar twin (one point) — the tests' cross-check path."""
    return int(latlng_to_cell([lat_deg], [lng_deg], res, table=table)[0])


# --- id helpers -------------------------------------------------------

def cell_resolution(h):
    return (np.asarray(h, dtype=np.int64) >> 52) & 0xF


def cell_base(h):
    return (np.asarray(h, dtype=np.int64) >> 45) & 0x7F


def cell_to_parent(h, parent_res: int):
    """Parent id = digit truncation (h3 cellToParent semantics)."""
    h = np.asarray(h, dtype=np.int64)
    res = (h >> 52) & 0xF
    if np.any(parent_res > res):
        raise ValueError("parent_res must be <= cell resolution")
    out = (h & ~(np.int64(0xF) << 52)) | (np.int64(parent_res) << 52)
    pad = np.int64(sum(7 << (45 - 3 * r)
                       for r in range(parent_res + 1, MAX_RES + 1)))
    return out | pad


def is_pentagon(h):
    h = np.asarray(h, dtype=np.int64)
    res = (h >> 52) & 0xF
    bc = (h >> 45) & 0x7F
    pent = _BC_PENT[bc]
    nonzero = np.zeros(h.shape, dtype=bool)
    for r in range(1, MAX_RES + 1):
        d = (h >> (45 - 3 * r)) & 0x7
        nonzero |= (r <= res) & (d != 0)
    return pent & ~nonzero


def compact_cells(h):
    """H3 compactCells semantics: repeatedly replace complete sibling
    sets (all 7 children of a parent — 6 for pentagon parents, whose K
    child is deleted) with the parent, until no set is complete. Input
    cells must share one resolution and be unique; output is the
    equivalent minimal multi-resolution cover, sorted."""
    h = np.unique(np.asarray(h, dtype=np.int64))
    if len(h) == 0:
        return h
    res = cell_resolution(h)
    if not (res == res[0]).all():
        raise ValueError("compact_cells input must share one resolution")
    out = []
    cur = h
    r = int(res[0])
    while r > 0 and len(cur) >= 6:
        parents = cell_to_parent(cur, r - 1)
        uniq, counts = np.unique(parents, return_counts=True)
        pent = is_pentagon(uniq)
        need = np.where(pent, 6, 7)
        full = counts == need
        full_parents = uniq[full]
        keep = ~np.isin(parents, full_parents)
        out.append(cur[keep])
        cur = full_parents
        r -= 1
    out.append(cur)
    return np.sort(np.concatenate(out))


def uncompact_cells(h, res: int):
    """Inverse of :func:`compact_cells`: expand every cell to its
    descendants at ``res`` (pentagon subtrees skip deleted-K branches).
    Exact inverse on compacted sets (tested)."""
    h = np.asarray(h, dtype=np.int64)
    if len(h) == 0:
        return h
    if np.any(cell_resolution(h) > res):
        raise ValueError("uncompact target res must be >= every cell")
    frontier = h
    out = []
    for _ in range(res + 1):
        r = cell_resolution(frontier)
        done = r == res
        out.append(frontier[done])
        frontier = frontier[~done]
        if len(frontier) == 0:
            break
        r = r[~done]
        # children: bump res nibble, set digit r+1 to each d (slot held 7)
        childs = []
        for d in range(7):
            shift = 45 - 3 * (r + 1)
            c = (
                (frontier & ~(np.int64(0xF) << 52))
                | ((r + 1) << 52)
            )
            c = c & ~(np.int64(0x7) << shift) | (np.int64(d) << shift)
            childs.append(c)
        frontier = np.concatenate(childs)
        # drop deleted pentagon K-subsequence ids
        bc = cell_base(frontier)
        pent = _BC_PENT[bc]
        fres = cell_resolution(frontier)
        lead = np.zeros(len(frontier), dtype=np.int64)
        for rr in range(1, MAX_RES + 1):
            d = (frontier >> (45 - 3 * rr)) & 0x7
            d = np.where(rr <= fres, d, 0)
            lead = np.where((lead == 0) & (d != 0), d, lead)
        frontier = frontier[~(pent & (lead == K_DIGIT))]
    return np.sort(np.concatenate(out))


def h3_to_string(h: int) -> str:
    return format(int(h) & ((1 << 64) - 1), "x")


def string_to_h3(s: str) -> int:
    return int(s, 16)
