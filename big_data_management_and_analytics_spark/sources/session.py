"""SparkSession construction + runtime tuning.

Two paths:

- ``get_spark()`` builds our own local session (tests, bench) with the full
  config set at build time.
- ``tune(spark)`` applies the *runtime-settable* subset to a session we did
  not build (the driver's). Verified this session: ``spark.sql.legacy.parquet.
  nanosAsLong``, session timezone, and Arrow flags are all settable via
  ``spark.conf.set`` on a running session (SURVEY.md §0 P1).

Scale posture: shuffle partitions default to a small count for local sf≤0.1
runs but are env-overridable (``SPARK_GRAFT_SHUFFLE_PARTITIONS``); on a real
cluster AQE coalescing makes the static number mostly irrelevant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Settings that are safe (and required) to set on a running session.
_RUNTIME_CONF = {
    # events.ts is parquet TIMESTAMP(NANOS) which Spark 4 cannot read natively
    # (PARQUET_TYPE_ILLEGAL); read as long + convert (SURVEY.md §0 P1).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # All fixture timestamps are tz-naive; pin UTC on both engines (P5).
    "spark.sql.session.timeZone": "UTC",
    # Spark 4 infers tz-naive parquet timestamps as TIMESTAMP_NTZ; keep the
    # classic TimestampType (interpreted in the UTC session tz) so all tables
    # share one timestamp type and window/interval functions behave uniformly.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Arrow for every Python boundary crossing (pandas UDFs, toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Local-mode shuffle sizing: the 200-partition default turns streaming
    # state stages into 200 tiny tasks at test scale. AQE coalesces batch
    # shuffles anyway; stateful streaming does not, so pin it here.
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
    ),
}


# SparkContexts that already received the package zip (by applicationId).
_PYFILES_SHIPPED: set[str] = set()
_PYFILES_DIRS: list[str] = []


@__import__("atexit").register
def _cleanup_pyfiles_dirs() -> None:
    """Remove the temp zip staging dirs at interpreter exit (Spark has
    its own copy after addPyFile; same discipline as the persisted-index
    and snapshot temp dirs — round-2 advice)."""
    import shutil

    for d in _PYFILES_DIRS:
        shutil.rmtree(d, ignore_errors=True)


def _ship_package(spark: SparkSession) -> None:
    """Make the engine package importable on Python workers regardless of
    the DRIVER process's working directory.

    Module-level pandas UDFs pickle by REFERENCE (cloudpickle only
    serializes ``__main__`` functions by value), so each worker must
    ``import big_data_management_and_analytics_spark...`` itself. Workers inherit the
    driver's cwd — if the harness imported ``__spark_entry__`` from some
    other directory, that import fails with ModuleNotFoundError on the
    first UDF task. ``addPyFile`` of a package zip is the runtime-settable
    fix (and the exact mechanism that ships this engine to a real
    cluster's executors); one ~100 KB upload per session."""
    try:
        sc = spark.sparkContext
        app = sc.applicationId
    except Exception:
        return
    if app in _PYFILES_SHIPPED:
        return
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tmp = tempfile.mkdtemp(prefix="bdma_pyfiles_")
    _PYFILES_DIRS.append(tmp)
    try:
        zip_path = shutil.make_archive(
            os.path.join(tmp, "big_data_management_and_analytics_spark_pkg"),
            "zip",
            root_dir=os.path.dirname(pkg_dir),
            base_dir=os.path.basename(pkg_dir),
        )
        sc.addPyFile(zip_path)
        _PYFILES_SHIPPED.add(app)
    except Exception:
        pass  # driver-side import still works; only exotic cwds need the zip


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable config to an externally-owned session."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # already-set static conf; keep going
    _ship_package(spark)
    return spark


def get_spark(app_name: str = "bdma-spark") -> SparkSession:
    """Local session for tests/bench. local[N] with AQE on."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Keep stdout/stderr clean for the bench artifact (round-4 verdict
        # item 2): stage progress bars are pure capture noise here.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())
