"""Table warehouse: Iceberg when the runtime jar is on the classpath,
parquet-with-manifest fallback otherwise (this sandbox has no Iceberg
jar). Either way the engine sees the same API: save/load named tables,
snapshot checkpoints per pipeline phase, resume from the last
committed phase.

Scale design: on a real cluster this is a thin veneer over
``df.writeTo(tbl).using("iceberg")`` with partition transforms
(bucket(N, blocking keys), days(ts)); snapshots/tags give resumable
checkpoints between phases (SURVEY.md §2.1 S7, reference analog:
cmd/matcher-v2/rebuild_fact_intelligent.go:9-42 layer snapshots).
The parquet fallback emulates snapshots with versioned directories +
a JSON manifest, keeping pipeline code identical.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class Warehouse:
    """Named-table store with phase checkpoints."""

    def __init__(self, spark: SparkSession, root: str,
                 catalog: str | None = None):
        self.spark = spark
        self.root = root
        self.use_iceberg = catalog is not None and iceberg_available(spark)
        self.catalog = catalog
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "_manifest.json")

    # ---------------------------------------------------------- manifest
    def _manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"tables": {}, "phases": {}}

    def _save_manifest(self, m: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path)

    # ------------------------------------------------------------ tables
    def save(self, df: DataFrame, name: str, mode: str = "overwrite",
             partition_by: list[str] | None = None) -> None:
        if self.use_iceberg:
            w = df.writeTo(f"{self.catalog}.{name}").using("iceberg")
            if mode == "overwrite":
                w.createOrReplace()
            else:
                w.append()
            return
        version = int(time.time() * 1000)
        path = os.path.join(self.root, name, f"v{version}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        m = self._manifest()
        entry = m["tables"].setdefault(name, {"versions": []})
        if mode == "overwrite":
            entry["versions"] = []
        entry["versions"].append(path)
        self._save_manifest(m)

    def load(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.table(f"{self.catalog}.{name}")
        m = self._manifest()
        entry = m["tables"].get(name)
        if not entry or not entry["versions"]:
            raise FileNotFoundError(f"table {name} not in warehouse {self.root}")
        if len(entry["versions"]) == 1:
            return self.spark.read.parquet(entry["versions"][0])
        df = self.spark.read.parquet(entry["versions"][0])
        for p in entry["versions"][1:]:
            df = df.unionByName(self.spark.read.parquet(p))
        return df

    def upsert(self, df: DataFrame, name: str, key: list[str]) -> None:
        """MERGE-style upsert: new rows win over existing rows with the
        same key (the reference's ON CONFLICT (src_id) DO UPDATE,
        internal/engine/matcher.go:118-127). Iceberg: MERGE INTO; the
        parquet fallback rewrites the table as (existing anti-join new)
        ∪ new."""
        if self.use_iceberg:
            df.createOrReplaceTempView("_upsert_src")
            cond = " AND ".join(f"t.{k} = s.{k}" for k in key)
            sets = ", ".join(f"t.{c} = s.{c}" for c in df.columns
                             if c not in key)
            self.spark.sql(
                f"MERGE INTO {self.catalog}.{name} t USING _upsert_src s "
                f"ON {cond} WHEN MATCHED THEN UPDATE SET {sets} "
                f"WHEN NOT MATCHED THEN INSERT *")
            return
        if self.exists(name):
            existing = self.load(name)
            kept = existing.join(df.select(*key).distinct(), key, "left_anti")
            merged = kept.unionByName(df, allowMissingColumns=True)
        else:
            merged = df
        # materialize before overwriting the files we read from
        merged = merged.localCheckpoint(eager=True)
        self.save(merged, name, mode="overwrite")

    def exists(self, name: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(f"{self.catalog}.{name}")
        return bool(self._manifest()["tables"].get(name, {}).get("versions"))

    # ------------------------------------------------- phase checkpoints
    def commit_phase(self, phase: str, tables: list[str]) -> None:
        """Record that ``phase`` completed with the given table state —
        the resume point (Iceberg analog: snapshot tag per layer)."""
        m = self._manifest()
        m["phases"][phase] = {"tables": tables, "ts": time.time()}
        self._save_manifest(m)

    def phase_done(self, phase: str) -> bool:
        return phase in self._manifest()["phases"]
