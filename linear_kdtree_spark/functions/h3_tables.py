"""Vendored Uber-H3 published constants + the derived base-cell lookup.

Everything here is PUBLIC knowledge, vendored with citation (exactly like
the S2 spec constants in functions/s2.py):

- ``FACE_CENTER_GEO`` / ``FACE_AXES_AZ_RADS_CII``: the H3 icosahedron
  orientation constants published in the H3 core library
  (h3geo.org / uber/h3 ``faceijk.c``: ``faceCenterGeo``,
  ``faceAxesAzRadsCII``; Apache-2.0 published spec constants).
- ``BASE_CELL_DATA``: the 122-entry base-cell table published in
  ``baseCells.c`` (``baseCellData``): home face, home ijk+ coordinate,
  pentagon flag, and the two clockwise-offset faces for pentagons.
- ``FACE_IJK_BASE_CELLS``: H3's ``faceIjkBaseCells[20][3][3][3]`` lookup
  ((face, i, j, k) -> (base cell, ccw 60deg rotations)). This table is
  NOT vendored: it is DERIVED from ``BASE_CELL_DATA`` + the icosahedron
  geometry by ``tools/h3_tablegen.py`` (base cells by geometric matching
  of res-0 lattice positions against the 122 home-cell centers;
  rotations by boundary-glue solving — the unique rotation making ids
  computed through that face agree with ids computed through
  already-solved faces at bisection-refined face-boundary straddle
  pairs), then embedded as ``_h3_table_generated.py``. The tablegen
  self-validates (exact id sets at res 0/1/2); ``tests/test_h3.py``
  pins published latlng->cell vectors.

The reference engine (rob05c/linear-kdtree) has no tiling query surface
at all (lkt.h:34-45); H3 ids are part of the mandated north-star query
surface ("H3/S2 tile assignment").
"""

from __future__ import annotations

# --- icosahedron orientation (faceijk.c: faceCenterGeo) ---------------
# (lat, lng) radians of each icosahedron face center, faces 0-19.
FACE_CENTER_GEO = (
    (0.803582649718989942, 1.248397419617396099),    # face  0
    (1.307747883455638156, 2.536945009877921159),    # face  1
    (1.054751253523952054, -1.347517358900396623),   # face  2
    (0.600191595538186799, -0.450603909469755746),   # face  3
    (0.491715428198773866, 0.401988202911306943),    # face  4
    (0.172745327415618701, 1.678146885280433686),    # face  5
    (0.605929321571350690, 2.953923329812411617),    # face  6
    (0.427370518328979641, -1.888876200336285401),   # face  7
    (-0.079066118549212831, -0.733429513380867741),  # face  8
    (-0.230961644455383637, 0.506495587332349035),   # face  9
    (0.079066118549212831, 2.408163140208925497),    # face 10
    (0.230961644455383637, -2.635097066257444203),   # face 11
    (-0.172745327415618701, -1.463445768309359553),  # face 12
    (-0.605929321571350690, -0.187669323777381622),  # face 13
    (-0.427370518328979641, 1.252716453253507838),   # face 14
    (-0.600191595538186799, 2.690988744120037492),   # face 15
    (-0.491715428198773866, -2.739604450678486295),  # face 16
    (-0.803582649718989942, -1.893195233972397139),  # face 17
    (-1.307747883455638156, -0.604647643711872080),  # face 18
    (-1.054751253523952054, 1.794075294689396615),   # face 19
)

# faceijk.c: faceAzRadsCII — azimuth from each face center to its CII
# i/j/k axes. Only [0] (the i-axis azimuth) enters the algorithms; [1]
# and [2] are [0] - 2pi/3 and [0] - 4pi/3 (asserted by tests).
FACE_AXES_AZ_RADS_CII = (
    (5.619958268523939882, 3.525563166130744542, 1.431168063737548730),
    (5.760339081714187279, 3.665943979320991689, 1.571548876927796127),
    (0.780213654393430055, 4.969003859179821079, 2.874608756786625655),
    (0.430469363979999913, 4.619259568766391033, 2.524864466373195467),
    (6.130269123335111400, 4.035874020941915804, 1.941478918548720291),
    (2.692877706530642877, 0.598482604137447119, 4.787272808923838195),
    (2.982963003477243874, 0.888567901084048369, 5.077358105870439581),
    (3.532912002790141181, 1.438516900396945656, 5.627307105183336758),
    (3.494305004259568154, 1.399909901866372864, 5.588700106652763840),
    (3.003214169499538391, 0.908819067106342928, 5.097609271892733906),
    (5.930472956509811562, 3.836077854116615875, 1.741682751723420374),
    (0.138378484090254847, 4.327168688876645809, 2.232773586483450311),
    (0.448714947059150361, 4.637505151845541521, 2.543110049452346120),
    (0.158629650112549365, 4.347419854898940135, 2.253024752505744869),
    (5.891865957979238535, 3.797470855586042958, 1.703075753192847583),
    (2.711123289609793325, 0.616728187216597771, 4.805518392002988683),
    (3.294508837434268316, 1.200113735041072948, 5.388903939827463911),
    (3.804819692245439833, 1.710424589852244509, 5.899214794638635174),
    (3.664438879055192436, 1.570043776661997111, 5.758833981448388027),
    (2.361378999196363184, 0.266983896803167583, 4.455774101589558636),
)

# --- baseCells.c: baseCellData ----------------------------------------
# (home_face, (i, j, k), is_pentagon, (cw_offset_face_1, cw_offset_face_2))
# cw offsets are -1 for non-pentagons and the two polar pentagons.
BASE_CELL_DATA = (
    (1, (1, 0, 0), 0, (-1, -1)),    # base cell 0
    (2, (1, 1, 0), 0, (-1, -1)),    # base cell 1
    (1, (0, 0, 0), 0, (-1, -1)),    # base cell 2
    (2, (1, 0, 0), 0, (-1, -1)),    # base cell 3
    (0, (2, 0, 0), 1, (-1, -1)),    # base cell 4 (N polar pentagon)
    (1, (1, 1, 0), 0, (-1, -1)),    # base cell 5
    (1, (0, 0, 1), 0, (-1, -1)),    # base cell 6
    (2, (0, 0, 0), 0, (-1, -1)),    # base cell 7
    (0, (1, 0, 0), 0, (-1, -1)),    # base cell 8
    (2, (0, 1, 0), 0, (-1, -1)),    # base cell 9
    (1, (0, 1, 0), 0, (-1, -1)),    # base cell 10
    (1, (0, 1, 1), 0, (-1, -1)),    # base cell 11
    (3, (1, 0, 0), 0, (-1, -1)),    # base cell 12
    (3, (1, 1, 0), 0, (-1, -1)),    # base cell 13
    (11, (2, 0, 0), 1, (2, 6)),     # base cell 14 (pentagon)
    (4, (1, 0, 0), 0, (-1, -1)),    # base cell 15
    (0, (0, 0, 0), 0, (-1, -1)),    # base cell 16
    (6, (0, 1, 0), 0, (-1, -1)),    # base cell 17
    (0, (0, 0, 1), 0, (-1, -1)),    # base cell 18
    (2, (0, 1, 1), 0, (-1, -1)),    # base cell 19
    (7, (0, 0, 1), 0, (-1, -1)),    # base cell 20
    (2, (0, 0, 1), 0, (-1, -1)),    # base cell 21
    (0, (1, 1, 0), 0, (-1, -1)),    # base cell 22
    (6, (0, 0, 1), 0, (-1, -1)),    # base cell 23
    (10, (2, 0, 0), 1, (1, 5)),     # base cell 24 (pentagon)
    (6, (0, 0, 0), 0, (-1, -1)),    # base cell 25
    (3, (0, 0, 0), 0, (-1, -1)),    # base cell 26
    (11, (1, 0, 0), 0, (-1, -1)),   # base cell 27
    (4, (1, 1, 0), 0, (-1, -1)),    # base cell 28
    (3, (0, 1, 0), 0, (-1, -1)),    # base cell 29
    (0, (0, 1, 1), 0, (-1, -1)),    # base cell 30
    (4, (0, 0, 0), 0, (-1, -1)),    # base cell 31
    (5, (0, 1, 0), 0, (-1, -1)),    # base cell 32
    (0, (0, 1, 0), 0, (-1, -1)),    # base cell 33
    (7, (0, 1, 0), 0, (-1, -1)),    # base cell 34
    (11, (1, 1, 0), 0, (-1, -1)),   # base cell 35
    (7, (0, 0, 0), 0, (-1, -1)),    # base cell 36
    (10, (1, 0, 0), 0, (-1, -1)),   # base cell 37
    (12, (2, 0, 0), 1, (3, 7)),     # base cell 38 (pentagon)
    (6, (1, 0, 1), 0, (-1, -1)),    # base cell 39
    (7, (1, 0, 1), 0, (-1, -1)),    # base cell 40
    (4, (0, 0, 1), 0, (-1, -1)),    # base cell 41
    (3, (0, 0, 1), 0, (-1, -1)),    # base cell 42
    (3, (0, 1, 1), 0, (-1, -1)),    # base cell 43
    (4, (0, 1, 0), 0, (-1, -1)),    # base cell 44
    (6, (1, 0, 0), 0, (-1, -1)),    # base cell 45
    (11, (0, 0, 0), 0, (-1, -1)),   # base cell 46
    (8, (0, 0, 1), 0, (-1, -1)),    # base cell 47
    (5, (0, 0, 1), 0, (-1, -1)),    # base cell 48
    (14, (2, 0, 0), 1, (0, 9)),     # base cell 49 (pentagon)
    (5, (0, 0, 0), 0, (-1, -1)),    # base cell 50
    (12, (1, 0, 0), 0, (-1, -1)),   # base cell 51
    (10, (1, 1, 0), 0, (-1, -1)),   # base cell 52
    (4, (0, 1, 1), 0, (-1, -1)),    # base cell 53
    (12, (1, 1, 0), 0, (-1, -1)),   # base cell 54
    (7, (1, 0, 0), 0, (-1, -1)),    # base cell 55
    (11, (0, 1, 0), 0, (-1, -1)),   # base cell 56
    (10, (0, 0, 0), 0, (-1, -1)),   # base cell 57
    (13, (2, 0, 0), 1, (4, 8)),     # base cell 58 (pentagon)
    (10, (0, 0, 1), 0, (-1, -1)),   # base cell 59
    (11, (0, 0, 1), 0, (-1, -1)),   # base cell 60
    (9, (0, 1, 0), 0, (-1, -1)),    # base cell 61
    (8, (0, 1, 0), 0, (-1, -1)),    # base cell 62
    (6, (2, 0, 0), 1, (11, 15)),    # base cell 63 (pentagon)
    (8, (0, 0, 0), 0, (-1, -1)),    # base cell 64
    (9, (0, 0, 1), 0, (-1, -1)),    # base cell 65
    (14, (1, 0, 0), 0, (-1, -1)),   # base cell 66
    (5, (1, 0, 1), 0, (-1, -1)),    # base cell 67
    (16, (0, 1, 1), 0, (-1, -1)),   # base cell 68
    (8, (1, 0, 1), 0, (-1, -1)),    # base cell 69
    (5, (1, 0, 0), 0, (-1, -1)),    # base cell 70
    (12, (0, 0, 0), 0, (-1, -1)),   # base cell 71
    (7, (2, 0, 0), 1, (12, 16)),    # base cell 72 (pentagon)
    (12, (0, 1, 0), 0, (-1, -1)),   # base cell 73
    (10, (0, 1, 0), 0, (-1, -1)),   # base cell 74
    (9, (0, 0, 0), 0, (-1, -1)),    # base cell 75
    (13, (1, 0, 0), 0, (-1, -1)),   # base cell 76
    (16, (0, 0, 1), 0, (-1, -1)),   # base cell 77
    (15, (0, 1, 1), 0, (-1, -1)),   # base cell 78
    (15, (0, 1, 0), 0, (-1, -1)),   # base cell 79
    (16, (0, 1, 0), 0, (-1, -1)),   # base cell 80
    (14, (1, 1, 0), 0, (-1, -1)),   # base cell 81
    (13, (1, 1, 0), 0, (-1, -1)),   # base cell 82
    (5, (2, 0, 0), 1, (10, 19)),    # base cell 83 (pentagon)
    (8, (1, 0, 0), 0, (-1, -1)),    # base cell 84
    (14, (0, 0, 0), 0, (-1, -1)),   # base cell 85
    (9, (1, 0, 1), 0, (-1, -1)),    # base cell 86
    (14, (0, 0, 1), 0, (-1, -1)),   # base cell 87
    (17, (0, 0, 1), 0, (-1, -1)),   # base cell 88
    (12, (0, 0, 1), 0, (-1, -1)),   # base cell 89
    (16, (0, 0, 0), 0, (-1, -1)),   # base cell 90
    (17, (0, 1, 1), 0, (-1, -1)),   # base cell 91
    (15, (0, 0, 1), 0, (-1, -1)),   # base cell 92
    (16, (1, 0, 1), 0, (-1, -1)),   # base cell 93
    (9, (1, 0, 0), 0, (-1, -1)),    # base cell 94
    (15, (0, 0, 0), 0, (-1, -1)),   # base cell 95
    (13, (0, 0, 0), 0, (-1, -1)),   # base cell 96
    (8, (2, 0, 0), 1, (13, 17)),    # base cell 97 (pentagon)
    (13, (0, 1, 0), 0, (-1, -1)),   # base cell 98
    (17, (1, 0, 1), 0, (-1, -1)),   # base cell 99
    (19, (0, 1, 0), 0, (-1, -1)),   # base cell 100
    (14, (0, 1, 0), 0, (-1, -1)),   # base cell 101
    (19, (0, 1, 1), 0, (-1, -1)),   # base cell 102
    (17, (0, 1, 0), 0, (-1, -1)),   # base cell 103
    (13, (0, 0, 1), 0, (-1, -1)),   # base cell 104
    (17, (0, 0, 0), 0, (-1, -1)),   # base cell 105
    (16, (1, 0, 0), 0, (-1, -1)),   # base cell 106
    (9, (2, 0, 0), 1, (14, 18)),    # base cell 107 (pentagon)
    (15, (1, 0, 1), 0, (-1, -1)),   # base cell 108
    (15, (1, 0, 0), 0, (-1, -1)),   # base cell 109
    (18, (0, 1, 1), 0, (-1, -1)),   # base cell 110
    (18, (0, 0, 1), 0, (-1, -1)),   # base cell 111
    (19, (0, 0, 1), 0, (-1, -1)),   # base cell 112
    (17, (1, 0, 0), 0, (-1, -1)),   # base cell 113
    (19, (0, 0, 0), 0, (-1, -1)),   # base cell 114
    (18, (0, 1, 0), 0, (-1, -1)),   # base cell 115
    (18, (1, 0, 1), 0, (-1, -1)),   # base cell 116
    (19, (2, 0, 0), 1, (-1, -1)),   # base cell 117 (S polar pentagon)
    (19, (1, 0, 0), 0, (-1, -1)),   # base cell 118
    (18, (0, 0, 0), 0, (-1, -1)),   # base cell 119
    (19, (1, 0, 1), 0, (-1, -1)),   # base cell 120
    (18, (1, 0, 0), 0, (-1, -1)),   # base cell 121
)

NUM_BASE_CELLS = 122
PENTAGONS = frozenset(
    bc for bc, d in enumerate(BASE_CELL_DATA) if d[2]
)  # {4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117}

# FACE_IJK_BASE_CELLS[face][i][j][k] -> (base_cell, ccw_rot60).
# Derived + solved by tools/h3_tablegen.py (see module docstring) and
# embedded below; regenerate with `python tools/h3_tablegen.py`.
FACE_IJK_BASE_CELLS: tuple | None = None  # placeholder until tablegen runs

try:  # generated file, written by tools/h3_tablegen.py
    from linear_kdtree_spark.functions._h3_table_generated import (  # noqa: F401
        FACE_IJK_BASE_CELLS as _GEN,
    )

    FACE_IJK_BASE_CELLS = _GEN
except ImportError:  # pragma: no cover - pre-generation bootstrap
    pass
