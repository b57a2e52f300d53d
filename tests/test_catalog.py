"""Table-format layer (Iceberg-or-parquet manifest emulation)."""

import numpy as np
import pandas as pd

from linear_kdtree_spark.operators.build import lkt_build
from linear_kdtree_spark.sources.catalog import TableCatalog, save_index


def test_catalog_roundtrip_and_snapshots(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    df1 = spark.range(10).withColumnRenamed("id", "v")
    m1 = cat.write("t", df1)
    assert cat.read("t").count() == 10
    df2 = spark.range(20).withColumnRenamed("id", "v")
    cat.write("t", df2)
    assert cat.read("t").count() == 20
    snaps = cat.snapshots("t")
    assert len(snaps) == 2
    # time travel to the first snapshot
    assert cat.read("t", snapshot_id=snaps[0]["id"]).count() == 10


def test_save_index_tables(spark, tmp_path):
    rng = np.random.default_rng(1)
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "key": np.arange(500),
                "x": rng.uniform(0, 100, 500).astype("float32"),
                "y": rng.uniform(0, 100, 500).astype("float32"),
            }
        )
    )
    idx = lkt_build(pts, max_depth=6, strategy="mean")
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    save_index(cat, idx)
    assert cat.read("lkt_points").count() == 500
    assert cat.read("lkt_splits").count() == idx.splits.count()
    assert cat.read("lkt_build_log").count() == len(idx.lineage)
    pm = cat.read("lkt_partition_metrics")
    assert pm.groupBy().sum("n_rows").first()[0] == 500


def test_append_keeps_snapshot_history(spark, tmp_path):
    """mode='append' ADDS rows to the table view (review r5: it was
    accepted but behaved as overwrite, silently dropping appended data)
    while every snapshot stays time-travelable."""
    cat = TableCatalog(spark, str(tmp_path / "cat2"))
    cat.write("t", spark.range(5).withColumnRenamed("id", "v"))
    cat.write("t", spark.range(7).withColumnRenamed("id", "v"), mode="append")
    cat.write("t", spark.range(9).withColumnRenamed("id", "v"), mode="append")
    snaps = cat.snapshots("t")
    assert len(snaps) == 3
    assert cat.read("t").count() == 5 + 7 + 9
    assert cat.read("t", snapshot_id=snaps[0]["id"]).count() == 5
    assert cat.read("t", snapshot_id=snaps[1]["id"]).count() == 12
    # a later overwrite resets the view; history still readable
    cat.write("t", spark.range(3).withColumnRenamed("id", "v"))
    assert cat.read("t").count() == 3
    assert cat.read("t", snapshot_id=snaps[2]["id"]).count() == 21


def test_write_modes_error_and_ignore(spark, tmp_path):
    import pytest

    cat = TableCatalog(spark, str(tmp_path / "cat3"))
    df5 = spark.range(5).withColumnRenamed("id", "v")
    cat.write("t", df5, mode="errorifexists")  # fresh table: fine
    with pytest.raises(ValueError):
        cat.write("t", df5, mode="errorifexists")
    before = cat.snapshots("t")
    cat.write("t", spark.range(9).withColumnRenamed("id", "v"), mode="ignore")
    assert cat.snapshots("t") == before  # ignore: no new snapshot
    assert cat.read("t").count() == 5
    with pytest.raises(ValueError):
        cat.write("t", df5, mode="bogus")


def test_save_index_bounds_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(2)
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "key": np.arange(400),
                "x": rng.uniform(0, 100, 400).astype("float32"),
                "y": rng.uniform(0, 100, 400).astype("float32"),
            }
        )
    )
    idx = lkt_build(pts, max_depth=6, strategy="mean", local_threshold=0)
    assert idx.tree.node_bounds  # distributed levels record bboxes
    cat = TableCatalog(spark, str(tmp_path / "cat3"))
    save_index(cat, idx, prefix="b")
    got = {
        int(r["node"]): (r["xmin"], r["xmax"], r["ymin"], r["ymax"])
        for r in cat.read("b_bounds").collect()
    }
    assert got == idx.tree.node_bounds


def test_iceberg_probe_documented(spark):
    """The Iceberg probe (COVERAGE.md) must run cleanly and report a
    boolean; in this sandbox no iceberg-spark-runtime jar exists, so the
    catalog must select the parquet emulation — if a jar ever appears on
    the classpath, this test flips to asserting real-Iceberg mode works."""
    from linear_kdtree_spark.sources.catalog import iceberg_available

    avail = iceberg_available(spark)
    assert isinstance(avail, bool)
    jvm_has_jar = False
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        jvm_has_jar = True
    except Exception:
        pass
    assert avail == jvm_has_jar
