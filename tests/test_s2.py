"""Self-verification of the from-scratch S2 implementation
(functions/s2.py) — no external s2 library exists in this container, so
correctness rests on: scalar-vs-vectorized cross-check, face anchors,
encode→decode→re-encode roundtrips, parent containment, and Hilbert
adjacency (consecutive curve positions are grid neighbors)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from linear_kdtree_spark.functions.s2 import (
    MAX_LEVEL,
    _face_ij_to_pos,
    _pos_to_face_ij,
    cell_id_level,
    cell_id_to_center_latlng,
    face_uv_to_cell_id,
    latlng_to_cell_id,
    latlng_to_cell_id_scalar,
    parent_cell_id,
)


def test_face_anchors():
    """The six axis points land on faces 0..5 (the defining cube layout)."""
    lats = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    lngs = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    ids = latlng_to_cell_id(lats, lngs, MAX_LEVEL).view(np.uint64)
    faces = (ids >> np.uint64(61)).astype(int)
    assert list(faces) == [0, 1, 2, 3, 4, 5]
    # face-center points sit at u=v=0 → s=t=0.5 → i=j=2^29
    # → every 2-bit Hilbert step stays defined; just check id validity: the
    # sentinel bit of a leaf id is bit 0
    assert all(int(i) & 1 == 1 for i in ids)


def test_scalar_vs_vectorized():
    rng = np.random.default_rng(5)
    lats = rng.uniform(-89.9, 89.9, 500)
    lngs = rng.uniform(-179.9, 179.9, 500)
    for level in (30, 12, 3):
        vec = latlng_to_cell_id(lats, lngs, level)
        sca = np.array(
            [latlng_to_cell_id_scalar(a, b, level) for a, b in zip(lats, lngs)],
            dtype=np.int64,
        )
        assert (vec == sca).all(), level


def test_level_encoding_and_parent_containment():
    rng = np.random.default_rng(6)
    lats = rng.uniform(-89.9, 89.9, 300)
    lngs = rng.uniform(-179.9, 179.9, 300)
    leaf = latlng_to_cell_id(lats, lngs, MAX_LEVEL)
    assert (cell_id_level(leaf) == MAX_LEVEL).all()
    for level in (20, 10, 4, 0):
        direct = latlng_to_cell_id(lats, lngs, level)
        via_parent = parent_cell_id(leaf, level)
        # encoding at a coarse level must equal truncating the leaf id —
        # the hierarchical-containment property the id scheme exists for
        assert (direct == via_parent).all(), level
        assert (cell_id_level(direct) == level).all()


def test_center_roundtrip():
    """Decoding a cell to an interior point and re-encoding at the same
    level must reproduce the id — at every level, including non-leaf."""
    rng = np.random.default_rng(7)
    lats = rng.uniform(-89.9, 89.9, 300)
    lngs = rng.uniform(-179.9, 179.9, 300)
    for level in (30, 15, 6):
        ids = latlng_to_cell_id(lats, lngs, level)
        clat, clng = cell_id_to_center_latlng(ids)
        again = latlng_to_cell_id(clat, clng, level)
        assert (again == ids).all(), level


def test_hilbert_adjacency():
    """Consecutive Hilbert positions differ by one step in exactly one of
    (i, j) — the continuity property that makes S2 ranges spatially
    compact. Checked by decoding a run of consecutive leaf positions."""
    face = np.zeros(1024, dtype=np.int64)
    pos = np.arange(1024, dtype=np.uint64)
    i, j = _pos_to_face_ij(face, pos)
    di = np.abs(np.diff(i))
    dj = np.abs(np.diff(j))
    assert ((di + dj) == 1).all()
    # and the decode is the true inverse of the encode
    back = _face_ij_to_pos(face, i, j)
    assert (back == pos).all()


def test_cell_count_balance():
    """At a coarse level, uniformly-spread points should occupy many cells
    with no pathological pile-up (the quadratic ST projection's purpose)."""
    rng = np.random.default_rng(8)
    n = 20000
    # uniform on the sphere via normal-vector trick
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    lats = np.rad2deg(np.arcsin(v[:, 2]))
    lngs = np.rad2deg(np.arctan2(v[:, 1], v[:, 0]))
    ids = latlng_to_cell_id(lats, lngs, 4)  # 6·4^4 = 1536 cells
    uniq, counts = np.unique(ids, return_counts=True)
    assert len(uniq) > 1000
    assert counts.max() < 15 * counts.mean()


def test_face_uv_core_matches_latlng_path():
    """face_uv_to_cell_id (the gate-pinned trig-free core) must agree with
    the full lat/lng path on points constructed from known face/uv."""
    from linear_kdtree_spark.functions.s2 import _face_uv_to_xyz

    rng = np.random.default_rng(9)
    face = rng.integers(0, 6, 400)
    u = rng.uniform(-0.999, 0.999, 400)
    v = rng.uniform(-0.999, 0.999, 400)
    x, y, z = _face_uv_to_xyz(face, u, v)
    norm = np.sqrt(x * x + y * y + z * z)
    lats = np.rad2deg(np.arcsin(z / norm))
    lngs = np.rad2deg(np.arctan2(y, x))
    assert (
        face_uv_to_cell_id(face, u, v, 30)
        == latlng_to_cell_id(lats, lngs, 30)
    ).all()


def test_assign_tiles_s2_spark(spark):
    from linear_kdtree_spark.operators.tile import assign_tiles_s2

    rng = np.random.default_rng(10)
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "key": np.arange(200),
            "x": rng.uniform(-179, 179, 200),
            "y": rng.uniform(-89, 89, 200),
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        r["key"]: r["s2_cell"]
        for r in assign_tiles_s2(df, 10).collect()
    }
    expect = latlng_to_cell_id(pdf["y"].to_numpy(), pdf["x"].to_numpy(), 10)
    for k in range(200):
        assert got[k] == int(expect[k]), k
