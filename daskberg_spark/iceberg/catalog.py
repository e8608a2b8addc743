"""Thin table catalog: name → IcebergTable, resolved into Spark SQL.

SURVEY §1.6: the reference's catalog model is a flat namespace→table
registry (REST client) resolving to a metadata location.  Spark-side, a
registered table becomes a temp view, so the full SQL surface (joins
across Iceberg tables, views over snapshots) works against connector
scans — ``register``/``register_path``/``refresh`` accept ``to_df``
scan kwargs (``filters=``, ``columns=``) so pruning applies at
registration time.
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
        self._scan_kwargs: dict[str, dict] = {}

    def register(
        self, name: str, table: IcebergTable, **scan_kwargs
    ) -> None:
        """Expose ``table`` as the SQL temp view ``name``.  Extra kwargs
        (``filters=``, ``columns=``) pass through to ``to_df`` — the
        registration-time pruning hook — and are remembered so
        ``refresh`` re-applies them."""
        self.tables[name] = table
        self._scan_kwargs[name] = scan_kwargs
        table.to_df(self.spark, **scan_kwargs).createOrReplaceTempView(name)

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
        "statistics",
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
        scan_kwargs = {
            k: kwargs.pop(k) for k in ("filters", "columns") if k in kwargs
        }
        table = IcebergTable(url, **kwargs)
        self.register(name, table, **scan_kwargs)
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
        """Re-pin the SQL view (and any registered ``name__suffix``
        metadata views) to the table's current state — BOTH kinds of
        staleness: in-memory snapshot selection (``open_snapshot`` time
        travel keeps working) and on-disk commits made after
        registration (the table reloads when a NEWER metadata version
        exists; an unconditional reload would clobber a time-travel
        selection, an unconditional skip would silently re-serve stale
        data)."""
        from daskberg_spark.iceberg.metadata import resolve_latest_version

        table = self.tables[name]
        if table._direct_meta is None and table._version is not None:
            try:
                latest = resolve_latest_version(table.url)
            except (FileNotFoundError, ValueError):
                latest = None
            if latest is not None and latest > table._version:
                table.set_version(latest)
        self.register(name, table, **self._scan_kwargs.get(name, {}))
        if name in self._meta_registered:
            self.register_metadata_views(name)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def drop(self, name: str) -> None:
        """Unregister the table AND every ``name__suffix`` metadata view
        it spawned — zombie views over dropped-table metadata would keep
        answering queries with stale data."""
        self.tables.pop(name, None)
        self._scan_kwargs.pop(name, None)
        self.spark.catalog.dropTempView(name)
        if name in self._meta_registered:
            self._meta_registered.discard(name)
            for suffix in self._META_TABLES:
                self.spark.catalog.dropTempView(f"{name}__{suffix}")
