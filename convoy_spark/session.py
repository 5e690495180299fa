"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32
threads); the same configs are what we would ship as defaults on a real
multi-executor cluster: AQE on (runtime re-planning, skew-join
mitigation, shuffle-partition coalescing), Arrow transfer for the few
Pandas-UDF operators, UTC session timezone so results are comparable
with the DuckDB oracle.

At 100 TB the knobs that matter are set here once so every pipeline
inherits them:

- ``spark.sql.adaptive.enabled`` — conversation/ur-conversation keys are
  heavily skewed (viral threads); AQE skew-join splitting is the first
  line of defense before explicit salting.
- ``spark.sql.shuffle.partitions`` — sized to cores locally; on a
  cluster AQE coalescing makes the static value mostly irrelevant, but
  a sane initial value avoids 200-partition tiny-file shuffles.
- ``spark.sql.files.maxPartitionBytes`` — 128 MB split size keeps scan
  tasks memory-bounded regardless of total input size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ensure_executor_imports(spark: SparkSession) -> None:
    """Make ``convoy_spark`` importable inside executor Python workers
    on ANY session — including one built without our ``get_spark()``
    (the driver constructs a vanilla SparkSession, possibly from a cwd
    outside the repo).

    Executor Python workers inherit ``PYTHONPATH`` from the JVM, which
    inherits it at launch — too late to fix from here. The runtime fix
    is ``sc.addPyFile``: zip the package once into the session's temp
    space and ship it; workers unpack onto ``sys.path``. Idempotent
    per SparkContext. Must be called by every operator that pickles
    package functions into a Python UDF stage (mapInPandas /
    applyInPandas); pure-expression operators never need it."""
    sc = spark.sparkContext
    if getattr(sc, "_convoy_pyfile_added", False):
        return
    pkg_dir = os.path.join(_REPO_ROOT, "convoy_spark")
    import tempfile
    import zipfile

    zpath = os.path.join(tempfile.gettempdir(), "convoy_spark_pkg.zip")
    tmp = zpath + f".{os.getpid()}.tmp"
    with zipfile.ZipFile(tmp, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                arc = os.path.join(
                    "convoy_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, arc)
    os.replace(tmp, zpath)
    sc.addPyFile(zpath)
    sc._convoy_pyfile_added = True


def _sized_shuffle_partitions(data_dir: str, cores: int) -> int:
    """Initial shuffle partitions sized to the DATA, not the core
    count: one partition per ~64 MB of input, clamped to [8, cores]
    locally. At sf0.1 the old cores-sized default (32) meant every
    shuffle ran 32 near-empty tasks — a measured ~30% of total bench
    wall-clock in pure task-launch tax. On a real cluster the same
    principle holds with a much larger clamp, and AQE coalescing
    refines the count from runtime sizes either way; this only picks
    a sane starting point."""
    total = 0
    for root, _dirs, files in os.walk(data_dir):
        for fn in files:
            if fn.endswith(".parquet"):
                try:
                    total += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
    return max(8, min(cores, total // (64 << 20) or 1))


def get_spark(
    app_name: str = "convoy-spark",
    cpus: int | None = None,
    data_dir: str | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    ``data_dir``: when given, initial shuffle partitions are sized to
    that dataset via :func:`_sized_shuffle_partitions` instead of the
    core count."""
    n = cpus or default_parallelism()
    shuffle_n = _sized_shuffle_partitions(data_dir, n) if data_dir else n
    # Pandas-UDF stages unpickle functions that reference this package
    # inside executor Python workers, which inherit PYTHONPATH from the
    # JVM — which inherits it from us. Export before the JVM launches
    # so the engine works no matter what cwd the driver runs from.
    pp = os.environ.get("PYTHONPATH", "")
    if _REPO_ROOT not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _REPO_ROOT + (os.pathsep + pp if pp else "")
        )
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # events.parquet stores TIMESTAMP(NANOS); Spark's µs timestamps
        # can't hold it, so read nanos as raw int64 and convert in
        # tables.load_table (truncate to µs, matching the oracle's
        # TIMESTAMP_NS→TIMESTAMP cast semantics).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
