"""S2 cell ids from scratch (vectorized numpy) — true H3/S2-style tile
interop for the engine (north_rule: "H3/S2 index"; the ``h3``/``s2``
packages are not in this container, so the construction is implemented
directly from the published S2 geometry definition:
https://s2geometry.io/devguide/s2cell_hierarchy — cube-face projection,
quadratic ST transform, per-face Hilbert curve, 64-bit ids with the
trailing-sentinel-bit encoding).

Layout identical to the reference library:
  id = face(3 bits) · 2^61  |  hilbert_position  |  sentinel 1 bit
where the sentinel (lowest set bit) encodes the level: leaf (level 30) ids
end in 1, a level-l id has its lowest set bit at 2·(30−l).

Ids are returned as *signed* int64 (two's-complement view of the uint64 id
— the standard way to carry S2 ids in systems without unsigned types,
e.g. BigQuery). All operations are numpy-vectorized; the scalar
re-implementation in ``latlng_to_cell_id_scalar`` exists only as an
independent cross-check for tests.

Self-verification strategy (tests/test_s2.py): face anchors (±x/±y/±z
points land on faces 0-5), encode→decode-center→re-encode roundtrips at
several levels, parent-containment consistency (encode at level l ==
parent(encode at level 30)), Hilbert adjacency (consecutive positions
differ by one step in exactly one of i/j), and uniform-cell-count sanity.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30

# Hilbert sub-cell orderings (s2geometry kPosToIJ / kPosToOrientation):
# kPosToIJ[orientation][position] = ij  (ij = i_bit·2 + j_bit)
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],
        [0, 2, 3, 1],
        [3, 2, 0, 1],
        [3, 1, 0, 2],
    ],
    dtype=np.int64,
)
# inverse permutations: kIJtoPos[orientation][ij] = position
_IJ_TO_POS = np.array(
    [
        [0, 1, 3, 2],
        [0, 3, 1, 2],
        [2, 3, 1, 0],
        [2, 1, 3, 0],
    ],
    dtype=np.int64,
)
_POS_TO_ORIENTATION = np.array([1, 0, 0, 3], dtype=np.int64)


def _latlng_to_xyz(lat_deg, lng_deg):
    lat = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    lng = np.deg2rad(np.asarray(lng_deg, dtype=np.float64))
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lng), cos_lat * np.sin(lng), np.sin(lat)


def _xyz_to_face_uv(x, y, z):
    """Cube face (0..5) and in-face (u, v) of unit-sphere points."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # largest absolute component picks the axis; its sign picks +axis/-axis.
    # Exact ties prefer the LATER axis (strict > comparisons), matching
    # reference S2's LargestAbsComponent: x only if ax>ay AND ax>az, else
    # y only if ay>az, else z — so face-boundary points (e.g. lng=±45°,
    # lat=0) get the same face/cell id as the real library.
    face = np.where(
        ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2)
    ).astype(np.int64)
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve) in enumerate(
        [
            (lambda: y / x, lambda: z / x),        # 0: +x
            (lambda: -x / y, lambda: z / y),       # 1: +y
            (lambda: -x / z, lambda: -y / z),      # 2: +z
            (lambda: z / x, lambda: y / x),        # 3: -x
            (lambda: z / y, lambda: -x / y),       # 4: -y
            (lambda: -y / z, lambda: -x / z),      # 5: -z
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u = np.where(m, ue(), u)
                v = np.where(m, ve(), v)
    return face, u, v


def _face_uv_to_xyz(face, u, v):
    """Inverse of :func:`_xyz_to_face_uv` (un-normalized)."""
    one = np.ones_like(u)
    xs = [one, -u, -u, -one, v, v]
    ys = [u, one, -v, -v, -one, u]
    zs = [v, v, one, -u, -u, -one]
    x = np.choose(face, xs)
    y = np.choose(face, ys)
    z = np.choose(face, zs)
    return x, y, z


def _uv_to_st(u):
    """S2's quadratic projection — equalizes cell areas across a face.

    Both np.where branches evaluate, so each sqrt argument is clamped at 0
    for the rows the other branch owns (1±3u is ≥0 on its own branch for
    any valid |u| ≤ 1; the clamp only silences the dead-branch warning and
    never changes a selected value)."""
    u = np.asarray(u, dtype=np.float64)
    return np.where(
        u >= 0.0,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


def _st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def _st_to_ij(s):
    n = 1 << MAX_LEVEL
    return np.clip(np.floor(np.asarray(s) * n), 0, n - 1).astype(np.int64)


def _face_ij_to_pos(face, i, j):
    """Hilbert-curve position of leaf (i, j) on ``face`` — the 60-bit core
    of the leaf cell id. Vectorized per-level loop (30 iterations)."""
    orientation = face & 1  # kSwapMask bit of the face
    pos = np.zeros_like(i, dtype=np.uint64)
    for k in range(MAX_LEVEL - 1, -1, -1):
        ij = ((i >> k) & 1) * 2 + ((j >> k) & 1)
        p = _IJ_TO_POS[orientation, ij]
        pos = (pos << np.uint64(2)) | p.astype(np.uint64)
        orientation = orientation ^ _POS_TO_ORIENTATION[p]
    return pos


def _pos_to_face_ij(face, pos):
    """Inverse of :func:`_face_ij_to_pos` (works for any 60-bit position,
    including the sentinel-padded positions of non-leaf ids — the padding
    walks to a near-center leaf, exactly like the reference decoder)."""
    orientation = face & 1
    i = np.zeros_like(pos, dtype=np.int64)
    j = np.zeros_like(pos, dtype=np.int64)
    for k in range(MAX_LEVEL - 1, -1, -1):
        p = ((pos >> np.uint64(2 * k)) & np.uint64(3)).astype(np.int64)
        ij = _POS_TO_IJ[orientation, p]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        orientation = orientation ^ _POS_TO_ORIENTATION[p]
    return i, j


def face_uv_to_cell_id(face, u, v, level: int = MAX_LEVEL) -> np.ndarray:
    """Vectorized (face, u, v) → S2 cell id at ``level``, as int64 — the
    trig-free core (quadratic ST + Hilbert + id packing): every operation
    is IEEE-exact or correctly rounded (sqrt, power-of-two scaling,
    floor), so this path is bit-reproducible across engines and is the one
    pinned by the driver's DuckDB-oracle gate."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    face = np.asarray(face, dtype=np.int64)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    pos = _face_ij_to_pos(face, i, j)
    leaf = (face.astype(np.uint64) << np.uint64(61)) | (
        pos << np.uint64(1)
    ) | np.uint64(1)
    if level == MAX_LEVEL:
        return leaf.view(np.int64)
    shift = np.uint64(2 * (MAX_LEVEL - level))
    lsb = np.uint64(1) << shift
    return (((leaf >> shift) << shift) | lsb).view(np.int64)


def latlng_to_cell_id(lat_deg, lng_deg, level: int = MAX_LEVEL) -> np.ndarray:
    """Vectorized (lat°, lng°) → S2 cell id at ``level``, as int64."""
    x, y, z = _latlng_to_xyz(lat_deg, lng_deg)
    face, u, v = _xyz_to_face_uv(x, y, z)
    return face_uv_to_cell_id(face, u, v, level)


def cell_id_level(cell_id) -> np.ndarray:
    """Level encoded by the lowest set bit."""
    cid = np.asarray(cell_id, dtype=np.int64).view(np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    # lsb = 2^(2*(30-level)) → level = 30 - log2(lsb)/2
    log2 = np.frexp(lsb.astype(np.float64))[1] - 1
    return (MAX_LEVEL - log2 // 2).astype(np.int64)


def cell_id_to_center_latlng(cell_id) -> tuple[np.ndarray, np.ndarray]:
    """(lat°, lng°) of each cell's center (any level)."""
    cid = np.asarray(cell_id, dtype=np.int64).view(np.uint64)
    face = (cid >> np.uint64(61)).astype(np.int64)
    pos = (cid & ((np.uint64(1) << np.uint64(61)) - np.uint64(1))) >> np.uint64(1)
    i, j = _pos_to_face_ij(face, pos)
    # center of the cell = center correction of the sentinel-padded leaf:
    # the reference applies a half-leaf nudge; the padded decode already
    # lands within the cell, and the half-leaf offset centers the leaf
    s = (i.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    x, y, z = _face_uv_to_xyz(face, _st_to_uv(s), _st_to_uv(t))
    norm = np.sqrt(x * x + y * y + z * z)
    lat = np.rad2deg(np.arcsin(np.clip(z / norm, -1.0, 1.0)))
    lng = np.rad2deg(np.arctan2(y, x))
    return lat, lng


def parent_cell_id(cell_id, level: int) -> np.ndarray:
    """Ancestor id at ``level`` (must be ≤ each id's own level)."""
    cid = np.asarray(cell_id, dtype=np.int64).view(np.uint64)
    shift = np.uint64(2 * (MAX_LEVEL - level))
    lsb = np.uint64(1) << shift
    return (((cid >> shift) << shift) | lsb).view(np.int64)


def latlng_to_cell_id_scalar(lat_deg: float, lng_deg: float,
                             level: int = MAX_LEVEL) -> int:
    """Independent scalar re-derivation (pure Python ints / math module) —
    the tests' cross-check against the vectorized path."""
    import math

    lat, lng = math.radians(lat_deg), math.radians(lng_deg)
    x = math.cos(lat) * math.cos(lng)
    y = math.cos(lat) * math.sin(lng)
    z = math.sin(lat)
    ax, ay, az = abs(x), abs(y), abs(z)
    # same strict-> tie order as the vectorized path (ties → later axis)
    if ax > ay:
        face, major = (0, x) if ax > az else (2, z)
    elif ay > az:
        face, major = 1, y
    else:
        face, major = 2, z
    if major < 0:
        face += 3
    u, v = {
        0: lambda: (y / x, z / x),
        1: lambda: (-x / y, z / y),
        2: lambda: (-x / z, -y / z),
        3: lambda: (z / x, y / x),
        4: lambda: (z / y, -x / y),
        5: lambda: (-y / z, -x / z),
    }[face]()

    def st(w):
        return 0.5 * math.sqrt(1 + 3 * w) if w >= 0 else 1 - 0.5 * math.sqrt(1 - 3 * w)

    n = 1 << MAX_LEVEL
    i = min(max(int(math.floor(st(u) * n)), 0), n - 1)
    j = min(max(int(math.floor(st(v) * n)), 0), n - 1)
    orientation = face & 1
    pos = 0
    ij_to_pos = [[0, 1, 3, 2], [0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0]]
    pos_to_orient = [1, 0, 0, 3]
    for k in range(MAX_LEVEL - 1, -1, -1):
        ij = ((i >> k) & 1) * 2 + ((j >> k) & 1)
        p = ij_to_pos[orientation][ij]
        pos = (pos << 2) | p
        orientation ^= pos_to_orient[p]
    cid = (face << 61) | (pos << 1) | 1
    if level < MAX_LEVEL:
        shift = 2 * (MAX_LEVEL - level)
        cid = ((cid >> shift) << shift) | (1 << shift)
    return cid - (1 << 64) if cid >= (1 << 63) else cid
