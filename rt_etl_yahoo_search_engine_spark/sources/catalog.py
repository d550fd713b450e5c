"""Table catalog: Iceberg when available, partitioned Parquet + JSON
manifests otherwise.

The design target (BASELINE.json) is an Iceberg table of web pages.  When a
Spark Iceberg catalog is configured (pass ``iceberg_namespace=`` or set
``SPARK_GRAFT_ICEBERG_NS=<catalog>.<db>``) AND the Iceberg runtime classes
load, ``Catalog.write``/``read`` go through the DataFrameWriterV2 path
(``df.writeTo(ns.table).using("iceberg")`` / ``spark.read.table``) — real
snapshot commits, schema evolution, and partition-pruned reads come from
Iceberg itself.  The posting BLOCK files stay path-addressed shard
directories in either mode: the scan-side query path and the serving path
read them via pyarrow by design (plans/bm25.py, plans/serve.py).

This sandbox has no Iceberg runtime jar and no pyiceberg (verified;
SURVEY.md header), so the catalog degrades LOUDLY to:

  * partitioned Parquet directories under a root path, and
  * an append-only manifest ledger of JSON-lines files, committed atomically
    via write-to-temp-then-``os.rename`` (same-filesystem rename is atomic on
    POSIX) — our analog of an Iceberg snapshot commit.

The manifest is the engine's lineage + checkpoint table (SURVEY.md §1.2 row
"manifest"): append-only, recovery reads the LATEST row per partition_id —
the same point-in-time "an update is an insert" ledger + top-1-per-key read
the reference uses for job status
(ref: database/tables.py:93-107, src/services/daos/status_dao.py:36-50,
src/models/dto_data_classes/status_dto.py:10-15).
"""

from __future__ import annotations

import json
import os
import time
import uuid


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


class Catalog:
    """Filesystem-rooted table namespace with atomic manifest commits."""

    MANIFEST_DIR = "_manifest"

    def __init__(self, root: str, iceberg_namespace: str | None = None):
        self.root = root
        self.iceberg_ns = iceberg_namespace or os.environ.get(
            "SPARK_GRAFT_ICEBERG_NS"
        )
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    # --- tables ---------------------------------------------------------

    def _ident(self, name: str) -> str:
        return f"{self.iceberg_ns}.{name.replace('/', '_')}"

    def _use_iceberg(self, spark) -> bool:
        return bool(self.iceberg_ns) and _iceberg_available(spark)

    def write(self, df, name: str, partition_by=None, mode: str = "overwrite"):
        if self._use_iceberg(df.sparkSession):
            from pyspark.sql import functions as F

            w = df.writeTo(self._ident(name)).using("iceberg")
            if partition_by:
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            if mode == "append":
                # first append must create the table; CTAS-or-append keeps
                # the call idempotent for resumed batches
                w.createOrReplace() if not self._table_exists(
                    df.sparkSession, name
                ) else w.append()
            else:
                w.createOrReplace()
            return
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))

    def _table_exists(self, spark, name: str) -> bool:
        try:
            return bool(spark.catalog.tableExists(self._ident(name)))
        except Exception:
            return False

    def read(self, spark, name: str, *more: str):
        if self._use_iceberg(spark):
            df = spark.read.table(self._ident(name))
            for n in more:
                df = df.unionByName(spark.read.table(self._ident(n)))
            return df
        return spark.read.parquet(self.path(name), *[self.path(n) for n in more])

    def exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f.startswith(("bucket=", "shard=", "part-"))
            for f in os.listdir(p)
        )

    # --- stats sidecar ----------------------------------------------------

    def write_stats(self, stats: dict) -> None:
        self._atomic_json(os.path.join(self.root, "stats.json"), stats)

    def read_stats(self) -> dict:
        with open(os.path.join(self.root, "stats.json")) as f:
            return json.load(f)

    # --- segment registry (incremental extensions) -------------------------
    #
    # Mutable index state lives in ONE json file committed by atomic rename
    # (the Iceberg version-hint analog): current corpus stats, the live
    # lexicon directory, and the list of posting segments with the global
    # avgdl each was encoded against (extensions shift global avgdl; the
    # query side corrects older segments' block-max bounds — plans/bm25.py).
    # A base-only index needs no registry; read_registry synthesizes one
    # from stats.json, so pre-extension indexes stay readable.

    REGISTRY = "segments.json"

    def read_registry(self) -> dict:
        p = os.path.join(self.root, self.REGISTRY)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        stats = self.read_stats()
        return {
            "version": 0,
            "n_docs": stats["n_docs"],
            "sum_dl": stats.get(
                "sum_dl", int(round(stats["avgdl"] * stats["n_docs"]))
            ),
            "avgdl": stats["avgdl"],
            "lexicon_dir": "lexicon",
            "segments": [{"dir": "postings", "avgdl": stats["avgdl"]}],
        }

    def write_registry(self, reg: dict) -> None:
        self._atomic_json(os.path.join(self.root, self.REGISTRY), reg)

    # --- manifest ledger (append-only, atomic) -----------------------------

    def append_manifest(self, rows: list[dict]) -> None:
        """Atomically append a batch of manifest rows (one commit = one file)."""
        mdir = os.path.join(self.root, self.MANIFEST_DIR)
        os.makedirs(mdir, exist_ok=True)
        stamp = f"{time.time():.6f}-{uuid.uuid4().hex[:8]}"
        final = os.path.join(mdir, f"commit-{stamp}.jsonl")
        self._atomic_lines(final, rows)

    def read_manifest(self) -> list[dict]:
        """All manifest rows in commit order (file mtime-stable by name)."""
        mdir = os.path.join(self.root, self.MANIFEST_DIR)
        if not os.path.isdir(mdir):
            return []
        rows: list[dict] = []
        for fname in sorted(os.listdir(mdir)):
            if not fname.endswith(".jsonl"):
                continue
            with open(os.path.join(mdir, fname)) as f:
                rows.extend(json.loads(line) for line in f if line.strip())
        return rows

    def latest_status(self) -> dict[str, dict]:
        """Latest manifest row per partition_id (the reference's top-1-per-key
        read, status_dao.py:47-49). Key is str(partition_id)."""
        latest: dict[str, dict] = {}
        for row in self.read_manifest():  # commit order -> last write wins
            latest[str(row["partition_id"])] = row
        return latest

    def completed_partitions(self) -> set[str]:
        return {
            pid
            for pid, row in self.latest_status().items()
            if row.get("status") == "COMPLETED"
        }

    # --- atomic writers ---------------------------------------------------

    @staticmethod
    def _atomic_json(path: str, obj: dict) -> None:
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=2, sort_keys=True)
        os.rename(tmp, path)

    @staticmethod
    def _atomic_lines(path: str, rows: list[dict]) -> None:
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(r, sort_keys=True) + "\n")
        os.rename(tmp, path)
