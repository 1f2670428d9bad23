"""SparkSession factory with the engine's scale-oriented defaults.

These settings are chosen for a multi-executor cluster reading ~100 TB
and degrade gracefully on local[N]:

* AQE on — runtime coalescing of small shuffle partitions and skew
  splitting (SURVEY.md §4: AQE covers shuffle-side skew; row-level
  skew from giant PDFs is handled by page explode + repartition in
  ``extractor.pipeline``).
* Arrow execution on, with a bounded ``maxRecordsPerBatch`` so a
  Python worker never materializes an unbounded batch of 50 MB
  binary html payloads (reference cap: constants.py:34).
* ``files.maxPartitionBytes`` kept at 128 MB so scan parallelism
  tracks input size; shuffle partitions default to cores on local
  mode and should be set ~2-3× total cores on a real cluster.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def package_pyfiles(out_dir: str = "/tmp") -> str:
    """Zip the ``extractor`` package for ``--py-files`` shipment.

    The reference ships code inside one service container; a Spark job
    must instead ship its Python package to every executor
    (north_rule: "run via spark-submit --py-files").  ``build_session``
    calls this and ``addPyFile``s the archive so UDF closures resolve
    on workers in local mode and on a real cluster alike.
    """
    pkg_dir = os.path.join(_REPO_ROOT, "extractor")
    zpath = os.path.join(out_dir, "extractor_pyfiles.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, _REPO_ROOT))
    return zpath


def build_session(
    app_name: str = "extractor",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    if shuffle_partitions is None:
        # local[N] / local[N,maxFailures] → N; anything unparsable
        # (a cluster master, local[*]) → cpu count. A real cluster
        # should pass an explicit value.
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        n = inner.split(",", 1)[0].strip()
        shuffle_partitions = int(n) if n.isdigit() else os.cpu_count()

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # Bound Arrow batches by BYTES too: with ~30 KB html payloads a
        # 4096-row batch is ~120 MB, which stalls the JVM→Python pipe
        # and anti-scales (measured 12.7s → 2.1s on a 830 MB scan at
        # local[32] when batches are bounded).  Records cap stays for
        # narrow rows; the byte cap governs wide ones.
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(8 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    try:
        spark.sparkContext.addPyFile(package_pyfiles())
    except Exception:
        # Already added in this context (getOrCreate may reuse), or a
        # restricted cluster; driver-side imports still work.
        pass
    return spark
