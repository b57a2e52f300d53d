"""SparkSession factory with scale-appropriate defaults.

Local mode is a correctness/bench sandbox; the configs are chosen so the
same code runs unchanged on a multi-executor cluster (AQE, adaptive skew
join, Arrow batching). Shuffle partition count follows the core count
instead of Spark's default 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "linear_kdtree_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = _default_shuffle_partitions(master, cpus)
    local_dir = _default_local_dir(extra_conf)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if master.startswith("local-cluster"):
        _ship_package(spark)
    return spark


def _default_local_dir(extra_conf: dict[str, str] | None) -> str | None:
    """Shuffle/broadcast scratch on a RAM disk when one is available.

    Local-mode shuffle files default to /tmp, i.e. the container's overlay
    disk — on this shared host its write stalls are the single largest
    source of bench variance (A/B fresh-JVM first builds at 4.8 M points:
    57-71 s on /tmp vs 20-47 s on /dev/shm, same minutes). The shuffle
    volumes this engine produces locally (≤ a few GB) fit tmpfs easily.
    Deliberately NOT applied when the deployment already chose a location:
    ``SPARK_LOCAL_DIRS`` env (Spark's own override, which outranks the
    conf anyway) or an explicit ``spark.local.dir`` in ``extra_conf``.
    On a real cluster the admin's conf wins by the same rule.

    Caveats (review r5) — the free-space check runs ONCE at session
    creation: a job whose shuffle/spill later outgrows tmpfs (capacity is
    typically 50% of RAM) fails with ENOSPC where a disk default had
    headroom, and SIGKILLed sessions leak their scratch dir as held RAM
    until reboot. Workloads near either edge should opt out with
    ``SPARK_GRAFT_NO_SHM=1`` (or set an explicit local dir)."""
    if (
        os.environ.get("SPARK_LOCAL_DIRS")
        or os.environ.get("SPARK_GRAFT_NO_SHM")
        or (extra_conf and "spark.local.dir" in extra_conf)
    ):
        return None
    shm = "/dev/shm"
    try:
        st = os.statvfs(shm)
        if st.f_bavail * st.f_frsize < 8 << 30 or not os.access(shm, os.W_OK):
            return None
    except OSError:
        return None
    path = os.path.join(shm, f"lkt-spark-local-{os.getuid()}")
    os.makedirs(path, exist_ok=True)
    return path


def _default_shuffle_partitions(master: str, cpus: int) -> int:
    """local[N] → N; local[*] / local-cluster[n,c,m] / cluster URLs → cpus
    (the local-cluster inner is three comma-separated numbers, not an int)."""
    inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
    return int(inner) if inner.isdigit() else cpus


def _ship_package(spark: SparkSession) -> None:
    """Ship the engine zip to executors (the spark-submit --py-files path).

    ``local-cluster[n,c,m]`` runs REAL separate executor JVMs whose Python
    workers do not share the driver's sys.path, exactly like a production
    cluster — so the package must travel as an archive. Idempotent per
    SparkContext (addPyFile raises on re-add of the same name in some
    versions; a context-keyed marker skips it)."""
    import tempfile
    import zipfile

    sc = spark.sparkContext
    if getattr(sc, "_lkt_pkg_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(tempfile.gettempdir(), f"lkt_engine_{os.getpid()}.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    sc.addPyFile(zpath)
    sc._lkt_pkg_shipped = True
