"""Write-audit-publish (WAP) manifest sink — an ACID-ish table commit
protocol on plain parquet, standing in for a Delta/Iceberg-style table
format (neither is in this container; the reference has only the
rename-committed text sink, ``/root/reference/src/mr/worker.go:160-184``
— this generalizes the same temp+rename idempotency trick to versioned
multi-file tables).

Protocol per snapshot:

1. WRITE   — data files land in ``data/snap-<id>/`` (a staging prefix no
             reader ever lists; executors write these via a normal
             distributed parquet job).
2. AUDIT   — the staged files are re-read and checked (row count,
             schema, caller-supplied predicates). Failure deletes the
             staging prefix; readers never saw it.
3. PUBLISH — a manifest JSON (file list + stats) is written, then the
             ``_current`` pointer is flipped with ``os.replace`` — the
             ONE atomic operation in the protocol. Readers resolve
             ``_current`` -> manifest -> exactly those files, so
             half-written snapshots and orphaned files are invisible.

Cluster posture: data-file writes scale out (plain parquet job); only
the pointer flip is centralized, and it's O(1) — the same shape
Iceberg's metadata pointer swap or a Hive-metastore location update
takes at any scale. Re-publishing an identical ``snapshot_id`` is a
no-op (idempotent pipeline re-runs); every historical version stays
readable until expired.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from collections.abc import Callable
from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


class AuditError(RuntimeError):
    """Raised when a staged snapshot fails its audit; nothing published."""


@dataclass
class Snapshot:
    version: int
    snapshot_id: str
    files: list[str]
    n_rows: int
    schema_ddl: str


class ManifestTable:
    """A directory-backed versioned parquet table with WAP commits."""

    def __init__(self, table_dir: str) -> None:
        self.table_dir = table_dir
        self.manifest_dir = os.path.join(table_dir, "_manifests")
        self.data_dir = os.path.join(table_dir, "data")
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # -- metadata ----------------------------------------------------

    def _current_path(self) -> str:
        return os.path.join(self.manifest_dir, "_current")

    def current_version(self) -> int | None:
        try:
            with open(self._current_path(), encoding="utf-8") as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.manifest_dir, f"manifest-{version:06d}.json")

    def snapshot(self, version: int) -> Snapshot:
        with open(self._manifest_path(version), encoding="utf-8") as f:
            m = json.load(f)
        return Snapshot(
            version=m["version"],
            snapshot_id=m["snapshot_id"],
            files=m["files"],
            n_rows=m["n_rows"],
            schema_ddl=m["schema_ddl"],
        )

    def history(self) -> list[Snapshot]:
        """All still-readable snapshots, oldest first (expired versions
        are skipped)."""
        cur = self.current_version()
        if cur is None:
            return []
        out = []
        for v in range(1, cur + 1):
            try:
                out.append(self.snapshot(v))
            except FileNotFoundError:
                continue  # expired
        return out

    def _find_snapshot_id(self, snapshot_id: str) -> int | None:
        for snap in self.history():
            if snap.snapshot_id == snapshot_id:
                return snap.version
        return None

    # -- the WAP commit ----------------------------------------------

    def publish(
        self,
        df: DataFrame,
        snapshot_id: str,
        audit: Callable[[DataFrame], str | None] | None = None,
    ) -> int:
        """Write ``df`` as the table's next version. Returns the version
        serving ``snapshot_id`` — the existing one if this id already
        published (idempotent re-run), else the freshly committed one.

        ``audit`` receives the RE-READ staged frame and returns an error
        string to abort (or None to pass) — checks run against what was
        actually written, not what was intended.
        """
        existing = self._find_snapshot_id(snapshot_id)
        if existing is not None:
            return existing

        spark = df.sparkSession
        staging = os.path.join(self.data_dir, f"snap-{snapshot_id}-{uuid.uuid4().hex[:8]}")
        df.write.mode("errorifexists").parquet(staging)

        try:
            staged = spark.read.parquet(staging)
            n_rows = staged.count()
            problems = audit(staged) if audit else None
            if problems:
                raise AuditError(problems)
        except Exception:
            shutil.rmtree(staging, ignore_errors=True)
            raise

        files = sorted(
            os.path.join(staging, f)
            for f in os.listdir(staging)
            if f.endswith(".parquet")
        )
        # Version assignment + pointer flip run under the commit lock:
        # concurrent writers serialize here (the table-format CAS — in
        # Iceberg this is the atomic metadata swap; on a filesystem,
        # O_EXCL lock-file acquisition). Everything expensive (the data
        # write, the audit) already happened outside the lock.
        with self._commit_lock():
            # re-check under the lock: another writer may have published
            # this snapshot_id while we were staging
            existing = self._find_snapshot_id(snapshot_id)
            if existing is not None:
                shutil.rmtree(staging, ignore_errors=True)
                return existing
            version = (self.current_version() or 0) + 1
            manifest = {
                "version": version,
                "snapshot_id": snapshot_id,
                "files": files,
                "n_rows": n_rows,
                "schema_ddl": staged.schema.simpleString(),
            }
            with open(self._manifest_path(version), "w", encoding="utf-8") as f:
                json.dump(manifest, f, indent=1)
            # THE atomic publish: readers either see the old pointer or
            # the new one, never a torn state.
            tmp = self._current_path() + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(str(version))
            os.replace(tmp, self._current_path())
            return version

    @contextmanager
    def _commit_lock(self, timeout_s: float = 30.0):
        """O_EXCL lock file — the poor-filesystem's CAS. Held only for
        the (tiny) manifest write + pointer flip."""
        lock = os.path.join(self.manifest_dir, "_commit.lock")
        deadline = time.monotonic() + timeout_s
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                if time.monotonic() > deadline:
                    raise TimeoutError(f"commit lock busy: {lock}")
                time.sleep(0.01)
        try:
            yield
        finally:
            os.close(fd)
            os.remove(lock)

    # -- reads -------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read a published version (default: current) by its manifest's
        exact file list — stray/orphaned files in data/ are ignored."""
        v = version if version is not None else self.current_version()
        if v is None:
            raise FileNotFoundError(f"no published version in {self.table_dir}")
        snap = self.snapshot(v)
        return spark.read.parquet(*snap.files)

    def read_history_harmonized(self, spark: SparkSession) -> DataFrame:
        """Every surviving version unioned under schema evolution:
        columns added in later snapshots read as NULL for earlier ones
        (unionByName with allowMissingColumns — the add-column-with-
        null-default read semantics of evolving table formats). A
        ``_version`` column tags provenance. Each snapshot's own schema
        stays recorded verbatim in its manifest (``schema_ddl``)."""
        from pyspark.sql import functions as F

        out = None
        for snap in self.history():
            df = self.read(spark, snap.version).withColumn(
                "_version", F.lit(snap.version)
            )
            out = df if out is None else out.unionByName(df, allowMissingColumns=True)
        if out is None:
            raise FileNotFoundError(f"no published version in {self.table_dir}")
        return out


    # -- lifecycle maintenance ---------------------------------------

    def expire_snapshots(self, keep_last: int) -> list[int]:
        """Expire all but the newest ``keep_last`` versions: their
        manifests are deleted so the versions stop being readable
        (the current pointer is untouched — it is always among the
        kept). Returns the expired version numbers. Data files are NOT
        touched here; ``vacuum`` reclaims files no kept manifest
        references — the Iceberg expire-snapshots / remove-orphan-files
        split, so a reader mid-query on a kept version never loses
        files."""
        cur = self.current_version()
        if cur is None:
            return []
        expired = [v for v in range(1, cur + 1) if v <= cur - keep_last]
        for v in expired:
            try:
                os.remove(self._manifest_path(v))
            except FileNotFoundError:
                pass
        return expired

    def vacuum(self) -> list[str]:
        """Delete data directories no surviving manifest references
        (expired snapshots' files + crashed writers' orphans). Returns
        the removed directories."""
        live: set[str] = set()
        cur = self.current_version()
        for v in range(1, (cur or 0) + 1):
            try:
                for f in self.snapshot(v).files:
                    live.add(os.path.dirname(f))
            except FileNotFoundError:
                continue
        removed = []
        for d in sorted(os.listdir(self.data_dir)):
            full = os.path.join(self.data_dir, d)
            if full not in live:
                shutil.rmtree(full, ignore_errors=True)
                removed.append(full)
        return removed

def manifest_wap_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query exercising the whole WAP protocol in one pass:
    publish the slim lineitem projection, abort an audit-failing empty
    snapshot (readers must stay on v1), re-publish the same snapshot_id
    (idempotent no-op), then aggregate the CURRENT version. Must equal
    the same aggregate over the original parquet (shared oracle with the
    csv/orc round-trips)."""
    import pyspark.sql.functions as F

    from tinymapreduce_spark.sources.loaders import load_table
    from tinymapreduce_spark.sources.textfiles import SCRATCH

    tag = os.path.basename(os.path.normpath(sf_dir))
    table = ManifestTable(os.path.join(SCRATCH, f"wap_lineitem_{tag}"))

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"
    )
    v1 = table.publish(li, snapshot_id="base", audit=lambda d: None if d.count() > 0 else "empty")
    try:
        table.publish(
            li.limit(0), snapshot_id="broken", audit=lambda d: None if d.count() > 0 else "empty"
        )
    except AuditError:
        pass
    assert table.publish(li, snapshot_id="base") == v1  # idempotent re-run

    back = table.read(spark)
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


def manifest_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel as a driver-checked query: day-1 publishes a partial
    load (orderkey % 3 != 0), day-2 publishes the full table; the query
    reads EVERY surviving version through the harmonized-history API
    and aggregates per version — so the oracle independently checks
    that version 1 still serves exactly the day-1 rows after version 2
    committed (reader isolation), and version 2 the full table.
    Re-runs are no-ops (snapshot-id idempotence), so the version
    numbering is stable across invocations."""
    import pyspark.sql.functions as F

    from tinymapreduce_spark.sources.loaders import load_table
    from tinymapreduce_spark.sources.textfiles import SCRATCH

    tag = os.path.basename(os.path.normpath(sf_dir))
    table = ManifestTable(os.path.join(SCRATCH, f"tt_lineitem_{tag}"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_orderkey"
    )
    table.publish(li.where("l_orderkey % 3 != 0"), snapshot_id="day1")
    table.publish(li, snapshot_id="day2")

    hist = table.read_history_harmonized(spark)
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return hist.groupBy(F.col("_version").cast("long").alias("version")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))).cast("double").alias("revenue"),
    )


MANIFEST_TT_SQL = """
SELECT CAST(1 AS BIGINT) AS version, COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem WHERE l_orderkey % 3 != 0
UNION ALL
SELECT CAST(2 AS BIGINT), COUNT(*),
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
FROM lineitem
"""
