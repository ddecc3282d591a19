"""Storage seam: every index-table write/commit goes through one interface
so a real cluster can swap Parquet-dirs-plus-manifest for Iceberg 1:1
(SURVEY.md §7 Phase 0; the sandbox bundles no Iceberg jars).

Mapping onto Iceberg when the jars + catalog are configured:

| seam call                      | Parquet impl (sandbox)              | Iceberg impl (cluster)                         |
|--------------------------------|-------------------------------------|------------------------------------------------|
| overwrite_partitions(df, root) | dynamic partitionOverwriteMode      | df.writeTo(tbl).overwritePartitions()          |
| overwrite_partition(df, root,K)| overwrite of root/seg=K/            | same, single-partition predicate               |
| overwrite(df, root)            | mode("overwrite") parquet           | writeTo(tbl).createOrReplace()                 |
| read(spark, root)              | spark.read.parquet (partition disc.)| spark.table(tbl)                               |
| commit_manifest(path, dict)    | atomic tmp+rename JSON              | Iceberg snapshot commit (metadata is the log)  |

The checkpoint/resume contract only relies on: (a) partition writes are
idempotent replaces, (b) the manifest commit is atomic and happens last.
Both hold in either implementation.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class ParquetTableIO:
    """Default sandbox implementation: partitioned parquet directories with
    an Iceberg-style snapshot manifest committed atomically last."""

    def overwrite_partitions(self, df: DataFrame, root: str, part_col: str) -> None:
        spark = df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        df.write.partitionBy(part_col).mode("overwrite").parquet(root)

    def overwrite_partition(
        self, df: DataFrame, root: str, part_col: str, value
    ) -> None:
        # data lands inside <root>/<part_col>=<value>/ with the constant
        # column dropped — identical layout to partitionBy, idempotent replay
        df.drop(part_col).write.mode("overwrite").parquet(
            os.path.join(root, f"{part_col}={value}")
        )

    def overwrite(self, df: DataFrame, root: str) -> None:
        df.write.mode("overwrite").parquet(root)

    def read(self, spark: SparkSession, root: str) -> DataFrame:
        return spark.read.parquet(root)

    def commit_manifest(self, path: str, manifest: dict) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, path)  # atomic commit — always the last step

    def read_manifest(self, path: str) -> dict | None:
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        return None


DEFAULT_IO = ParquetTableIO()
