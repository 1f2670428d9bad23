"""Sink/lineage/resume invariants (FIXTURES.md §4, SURVEY.md §5 item 3)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from extractor.config import ExtractConfig
from extractor.testgen import TEST_MAX_BYTES, pages_df
from extractor.writer import (
    committed_run_ids,
    read_extracted,
    read_lineage,
    resume_filter,
    write_snapshot,
)
from tests.conftest import SF_TINY

CFG = ExtractConfig(max_bytes=TEST_MAX_BYTES)


def test_write_resume_lineage(spark, tmp_path):
    from extractor.pipeline import run_extraction

    out_dir = str(tmp_path / "extracted")
    pages = pages_df(spark, SF_TINY).cache()
    n_total = pages.count()

    # interrupted first run: only half the input was processed
    first_half = pages.filter(F.col("url") < "https://example-42.test/m")
    n_first = first_half.count()
    assert 0 < n_first < n_total
    run1 = write_snapshot(run_extraction(spark, first_half, CFG), out_dir)
    assert committed_run_ids(out_dir) == [run1]

    # resume: anti-join leaves exactly the delta
    remaining = resume_filter(pages, out_dir)
    assert remaining.count() == n_total - n_first
    run2 = write_snapshot(run_extraction(spark, remaining, CFG), out_dir)

    # committed view: complete, no duplicate urls
    result = read_extracted(spark, out_dir)
    assert result.count() == n_total
    assert result.select("url").distinct().count() == n_total

    # re-resume is a no-op (idempotency)
    assert resume_filter(pages, out_dir).count() == 0

    # lineage: per-partition rows summing to the input
    lineage = read_lineage(spark, out_dir)
    sums = lineage.agg(
        F.sum("row_count").alias("rows"),
        F.sum("ok_count").alias("ok"),
        F.sum("err_count").alias("err"),
    ).first()
    assert sums["rows"] == n_total
    assert sums["ok"] + sums["err"] == n_total
    assert set(r["run_id"] for r in lineage.collect()) == {run1, run2}

    # snapshot time travel: as-of the first commit sees only run1 rows
    assert read_extracted(spark, out_dir, as_of=run1).count() == n_first
    assert read_extracted(spark, out_dir, as_of=run2).count() == n_total
    try:
        read_extracted(spark, out_dir, as_of="nonexistent")
        assert False, "unknown snapshot id should raise"
    except FileNotFoundError:
        pass


def test_uncommitted_snapshot_invisible(spark, tmp_path):
    """A data dir without a manifest must not be readable — the
    crash-safety property Iceberg snapshots give for free."""
    from extractor.pipeline import run_extraction

    out_dir = str(tmp_path / "extracted2")
    pages = pages_df(spark, SF_TINY).limit(20)
    run_extraction(spark, pages, CFG).write.parquet(
        os.path.join(out_dir, "snapshots", "orphan")
    )
    # no _committed manifest → reader sees nothing, resume is full re-run
    assert resume_filter(pages, out_dir) is pages
    try:
        read_extracted(spark, out_dir)
        assert False, "orphan snapshot should be invisible"
    except FileNotFoundError:
        pass


def test_run_extract_script_end_to_end(spark, tmp_path, monkeypatch, capsys):
    """The spark-submit entry (scripts/run_extract.py) commits a
    snapshot and its --resume re-run appends nothing."""
    import importlib
    import sys

    scripts_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    )
    sys.path.insert(0, scripts_dir)
    try:
        run_extract = importlib.import_module("run_extract")
    finally:
        sys.path.remove(scripts_dir)

    out_dir = str(tmp_path / "job_out")
    argv = ["run_extract.py", "--input", SF_TINY, "--output", out_dir,
            "--synthesize", "--resume"]
    monkeypatch.setattr(sys, "argv", argv)
    # build_session getOrCreate()s the suite's shared session; the
    # script's stop() must not tear it down under the other tests.
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    assert run_extract.main() == 0
    n1 = read_extracted(spark, out_dir).count()
    assert n1 > 0
    assert "committed snapshot" in capsys.readouterr().out
    # resume: second run must add zero rows
    monkeypatch.setattr(sys, "argv", argv)
    assert run_extract.main() == 0
    assert read_extracted(spark, out_dir).count() == n1


def test_partitioned_snapshot_prunes_and_reads_back(spark, tmp_path):
    """partition_by hive-partitions the snapshot; a doc_type filter on
    the read path becomes a partition-pruned scan, and the full
    read-back equals the unpartitioned write."""
    from extractor.pipeline import run_extraction

    out_dir = str(tmp_path / "extracted_part")
    pages = pages_df(spark, SF_TINY).limit(120)
    extracted = run_extraction(spark, pages, CFG)
    write_snapshot(extracted, out_dir, partition_by=["doc_type"])

    back = read_extracted(spark, out_dir)
    assert back.count() == extracted.count()
    # hive layout on disk: doc_type=html / doc_type=pdf directories
    import glob

    snap_dir = glob.glob(os.path.join(out_dir, "snapshots", "*"))[0]
    subdirs = {os.path.basename(p) for p in glob.glob(os.path.join(snap_dir, "doc_type=*"))}
    assert {"doc_type=html", "doc_type=pdf"} <= subdirs
    # the filter reaches the scan as a partition filter (pruning)
    plan = (
        back.filter(F.col("doc_type") == "pdf")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "doc_type" in plan.split("PartitionFilters")[1][:200]


def test_compaction_folds_snapshots_preserving_view_and_history(spark, tmp_path):
    """compact_snapshots rewrites N live snapshots into one: the live
    view is unchanged (same rows, one snapshot), resume still works,
    and as-of time travel to a pre-compaction run still sees only that
    run's rows."""
    from extractor.pipeline import run_extraction
    from extractor.writer import compact_snapshots

    out_dir = str(tmp_path / "compacted")
    pages = pages_df(spark, SF_TINY).cache()
    n_total = pages.count()
    half = pages.filter(F.col("url") < "https://example-42.test/m")
    n_half = half.count()
    run1 = write_snapshot(run_extraction(spark, half, CFG), out_dir)
    run2 = write_snapshot(
        run_extraction(spark, resume_filter(pages, out_dir), CFG), out_dir
    )
    assert len(committed_run_ids(out_dir)) == 2

    crun = compact_snapshots(spark, out_dir, target_partitions=2)
    assert crun is not None
    # live view: one snapshot, identical content
    assert committed_run_ids(out_dir) == [crun]
    back = read_extracted(spark, out_dir)
    assert back.count() == n_total
    assert back.select("url").distinct().count() == n_total
    # resume over the compacted table is still a no-op
    assert resume_filter(pages, out_dir).count() == 0
    # time travel reaches pre-compaction history
    assert read_extracted(spark, out_dir, as_of=run1).count() == n_half
    assert read_extracted(spark, out_dir, as_of=run2).count() == n_total
    # idempotence: nothing left to compact
    assert compact_snapshots(spark, out_dir) is None
    # compaction lineage: one audit row per folded snapshot
    lineage = read_lineage(spark, out_dir)
    folded = lineage.filter(F.col("run_id") == crun)
    assert folded.count() == 2
    assert folded.agg(F.sum("row_count")).first()[0] == n_total


def test_writer_backend_selection(spark, tmp_path):
    """The backend enum is real: unknown backends and a missing table
    name fail fast, and the iceberg branch fails LOUDLY when the
    session has no catalog configured (never silently falling back to
    the manifest emulation)."""
    import pytest

    df = spark.createDataFrame(
        [("https://x.test/a.html", True, 0.1)], ["url", "success", "latency_s"]
    )
    out_dir = str(tmp_path / "sink")
    with pytest.raises(ValueError, match="unknown writer backend"):
        write_snapshot(df, out_dir, backend="nope")
    with pytest.raises(ValueError, match="iceberg_table"):
        write_snapshot(df, out_dir, backend="iceberg")
    with pytest.raises(RuntimeError, match="catalog"):
        write_snapshot(df, out_dir, backend="iceberg", iceberg_table="cat.db.t")
    # nothing was committed by any failed attempt
    assert committed_run_ids(out_dir) == []


def test_writer_iceberg_catalog_detection(spark):
    """_iceberg_catalog_names sees catalogs registered at runtime via
    spark.sql.catalog.<name>; with one attached the branch proceeds to
    writeTo().append() (exercised end-to-end only on a deployment with
    the iceberg-spark-runtime jar — not installable in this sandbox)."""
    from extractor.writer import _iceberg_catalog_names

    assert _iceberg_catalog_names(spark) == []
    spark.conf.set(
        "spark.sql.catalog.testcat", "org.apache.iceberg.spark.SparkCatalog"
    )
    try:
        assert "testcat" in _iceberg_catalog_names(spark)
    finally:
        spark.conf.unset("spark.sql.catalog.testcat")


def _find_iceberg_jar() -> str | None:
    """Locate an iceberg-spark-runtime jar: $ICEBERG_JAR, then the
    pyspark jars dir.  This sandbox ships neither and has no network
    (vendoring was attempted r4: repo1.maven.org unresolvable), so the
    live-append test below documents itself as skipped; on any host
    with the jar it runs for real."""
    env = os.environ.get("ICEBERG_JAR")
    if env and os.path.exists(env):
        return env
    import glob

    import pyspark

    hits = glob.glob(
        os.path.join(os.path.dirname(pyspark.__file__), "jars",
                     "iceberg-spark-runtime*.jar")
    )
    return hits[0] if hits else None


def test_iceberg_live_append_roundtrip(tmp_path):
    """Live writeTo(table).append() through the iceberg writer branch
    against a hadoop-type catalog, then read the snapshot back.  Needs
    iceberg-spark-runtime on the session classpath — skipped (with the
    vendoring attempt documented in _find_iceberg_jar/BASELINE.md)
    when the jar is absent."""
    import pytest

    jar = _find_iceberg_jar()
    if jar is None:
        pytest.skip(
            "no iceberg-spark-runtime jar: sandbox has no network to "
            "vendor one (attempt recorded in BASELINE.md); the branch's "
            "plan construction + fail-fast are covered by "
            "test_writer_backend_enum"
        )
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("iceberg-live")
        .config("spark.jars", jar)
        .config("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.ice.type", "hadoop")
        .config("spark.sql.catalog.ice.warehouse", str(tmp_path / "wh"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        df = spark.createDataFrame(
            [("u1", "t1", True), ("u2", "t2", False)],
            "url: string, text: string, success: boolean",
        )
        run_id = write_snapshot(
            df, out_dir="", backend="iceberg", iceberg_table="ice.db.pages"
        )
        back = spark.table("ice.db.pages")
        assert back.count() == 2
        assert {"partition_id", "lineage_id"} <= set(back.columns)
        assert "run_id" not in back.columns  # schema parity with manifest branch
        lid = back.filter(F.col("url") == "u1").select("lineage_id").first()[0]
        import hashlib

        assert lid == hashlib.md5(f"u1:{run_id}".encode()).hexdigest()
    finally:
        spark.stop()


def test_run_extract_strip_templates_flag(spark, tmp_path, monkeypatch):
    """--strip-templates removes a host's repeated boilerplate line
    from every extracted html page while leaving unique content, other
    hosts, and non-html rows untouched."""
    import datetime as dt
    import importlib
    import sys

    scripts_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    )
    sys.path.insert(0, scripts_dir)
    try:
        run_extract = importlib.import_module("run_extract")
    finally:
        sys.path.remove(scripts_dir)

    def page(i, host):
        html = (
            f"<html><body><p>COOKIE BANNER PLEASE ACCEPT</p>"
            f"<p>unique article body number {i} with several words of"
            f" real content to keep the block classifier happy</p>"
            f"</body></html>"
        ).encode()
        return (f"https://{host}/p{i}.html", dt.datetime(2025, 6, 1), html,
                None, "en")

    rows = [page(i, "tpl.test") for i in range(5)] + [
        page(9, "other.test")  # single page: below min_pages, untouched
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    in_dir = str(tmp_path / "pages_in")
    pages.write.parquet(in_dir)
    out_dir = str(tmp_path / "strip_out")
    argv = ["run_extract.py", "--input", in_dir, "--output", out_dir,
            "--strip-templates"]
    monkeypatch.setattr(sys, "argv", argv)
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    assert run_extract.main() == 0
    got = {r.url: r.text for r in read_extracted(spark, out_dir).collect()}
    for i in range(5):
        t = got[f"https://tpl.test/p{i}.html"]
        assert "COOKIE BANNER" not in t
        assert f"unique article body number {i}" in t
    # the single-page host keeps its banner (min_pages guard)
    assert "COOKIE BANNER" in got["https://other.test/p9.html"]


def test_expire_snapshots_retention_and_loud_time_travel(spark, tmp_path):
    """Retention is prefix-consistent: keep_last retains AS-OF POINTS
    (whole live sets), expiry removes only snapshots no retained
    point and not the live view can reach, expired points fail
    loudly, and re-runs are idempotent re-sweeps."""
    import os

    import pytest as _pytest

    from extractor.pipeline import run_extraction
    from extractor.writer import compact_snapshots, expire_snapshots

    out_dir = str(tmp_path / "retained")
    pages = pages_df(spark, SF_TINY).cache()
    n_total = pages.count()
    half = pages.filter(F.col("url") < "https://example-42.test/m")
    run1 = write_snapshot(run_extraction(spark, half, CFG), out_dir)
    run2 = write_snapshot(
        run_extraction(spark, resume_filter(pages, out_dir), CFG), out_dir
    )
    crun = compact_snapshots(spark, out_dir, target_partitions=2)
    # second era: one more append (fresh urls), compacted again
    run3 = write_snapshot(
        run_extraction(spark, half, CFG).withColumn(
            "url", F.concat(F.col("url"), F.lit("#r3"))
        ),
        out_dir,
    )
    crun2 = compact_snapshots(spark, out_dir, target_partitions=2)
    assert crun2 is not None
    n_live = read_extracted(spark, out_dir).count()

    # keep_last=1 retains run3's point: its live set is {crun, run3},
    # so only the first era (run1, run2) expires
    gone = expire_snapshots(out_dir, keep_last=1)
    assert set(gone) == {run1, run2}
    assert committed_run_ids(out_dir) == [crun2]
    assert read_extracted(spark, out_dir).count() == n_live
    assert read_extracted(spark, out_dir, as_of=run3).count() == n_live
    assert read_extracted(spark, out_dir, as_of=crun).count() == n_total
    assert not os.path.isdir(os.path.join(out_dir, "snapshots", run1))
    for dead in (run1, run2):
        with _pytest.raises(FileNotFoundError, match="expired"):
            read_extracted(spark, out_dir, as_of=dead)
    # idempotent re-sweep, then keep_last=0 drops all history
    assert set(expire_snapshots(out_dir, keep_last=1)) == {run1, run2}
    assert set(expire_snapshots(out_dir, keep_last=0)) == {
        run1, run2, crun, run3
    }
    with _pytest.raises(FileNotFoundError, match="expired"):
        read_extracted(spark, out_dir, as_of=run3)
    # the live table itself is never expired
    assert read_extracted(spark, out_dir).count() == n_live


def test_run_extract_expire_flag(spark, tmp_path, monkeypatch, capsys):
    """--expire-keep-last drives retention from the cluster entrypoint:
    two appends + compaction + keep_last=0 leaves one live snapshot
    and no readable history."""
    import importlib
    import sys

    import pytest as _pytest

    scripts_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    )
    sys.path.insert(0, scripts_dir)
    try:
        run_extract = importlib.import_module("run_extract")
    finally:
        sys.path.remove(scripts_dir)
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)

    out_dir = str(tmp_path / "job_out")
    base = ["run_extract.py", "--input", SF_TINY, "--output", out_dir,
            "--synthesize"]
    monkeypatch.setattr(sys, "argv", base)
    assert run_extract.main() == 0
    first = committed_run_ids(out_dir)[0]
    monkeypatch.setattr(
        sys, "argv", base + ["--compact-after", "--expire-keep-last", "0"]
    )
    assert run_extract.main() == 0
    out = capsys.readouterr().out
    assert "compacted into" in out and "expired 2 snapshot(s)" in out
    assert len(committed_run_ids(out_dir)) == 1
    with _pytest.raises(FileNotFoundError, match="expired"):
        read_extracted(spark, out_dir, as_of=first)
