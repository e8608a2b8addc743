"""Thin table catalog: name → IcebergTable, resolved into Spark SQL.

SURVEY §1.6: the reference's catalog model is a flat namespace→table
registry (REST client) resolving to a metadata location.  Spark-side, a
registered table becomes a temp view, so the full SQL surface (joins
across Iceberg tables, views over snapshots) works against connector
scans — with pruning still applied at registration time via optional
filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

import daskberg_spark.iceberg.scan  # noqa: F401  (attaches .to_df)
from daskberg_spark.iceberg.metadata import IcebergTable
from daskberg_spark.iceberg.rest import IceRestClient


class Catalog:
    """Local name → IcebergTable registry with Spark view resolution."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self.tables: dict[str, IcebergTable] = {}
        self._meta_registered: set[str] = set()

    def register(self, name: str, table: IcebergTable) -> None:
        self.tables[name] = table
        table.to_df(self.spark).createOrReplaceTempView(name)

    # metadata-table SQL suffixes (real Iceberg's ``tbl$files`` idiom)
    _META_TABLES = (
        "files",
        "delete_files",
        "all_files",
        "all_data_files",
        "all_delete_files",
        "snapshots",
        "history",
        "refs",
        "manifests",
        "all_manifests",
        "entries",
        "all_entries",
        "metadata_log_entries",
        "partitions",
        "position_deletes",
    )

    def register_metadata_views(self, name: str) -> list[str]:
        """Register the table's metadata tables as SQL temp views —
        real Iceberg's ``tbl$suffix`` idiom, spelled ``name__suffix``
        because ``$`` is not a legal Spark temp-view character
        (``SELECT * FROM t__snapshots``).  Returns the registered view
        names.  Views are snapshots of the metadata at registration —
        call again (or ``refresh``) after commits."""
        table = self.tables[name]
        out = []
        for suffix in self._META_TABLES:
            df = getattr(table, f"{suffix}_df")(self.spark)
            vname = f"{name}__{suffix}"
            df.createOrReplaceTempView(vname)
            out.append(vname)
        self._meta_registered.add(name)
        return out

    def register_path(self, name: str, url: str, **kwargs) -> IcebergTable:
        table = IcebergTable(url, **kwargs)
        self.register(name, table)
        return table

    def register_rest(
        self, client: IceRestClient, name: str, namespace: str | None = None
    ) -> IcebergTable:
        """Resolve through a REST catalog (metadata-location handoff)."""
        table = client.open_table(name, namespace)
        self.register(name, table)
        return table

    def register_view(self, name: str, url: str, version_id: int | None = None):
        """Register an Iceberg VIEW (view spec v1, ``views.py``) under a
        SQL name: the stored SQL resolves late against the tables this
        catalog has already registered — per spec, a view version pins
        the QUERY TEXT, not table snapshots."""
        from daskberg_spark.iceberg.views import IcebergView

        view = IcebergView(url)
        if version_id is not None:
            view.open_version(version_id)
        view.to_df(self.spark).createOrReplaceTempView(name)
        return view

    def refresh(self, name: str) -> None:
        """Re-pin the view to the table's current snapshot state —
        including any registered ``name__suffix`` metadata views (they
        are snapshots of the metadata at registration time)."""
        self.register(name, self.tables[name])
        if name in self._meta_registered:
            self.register_metadata_views(name)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def drop(self, name: str) -> None:
        self.tables.pop(name, None)
        self.spark.catalog.dropTempView(name)
