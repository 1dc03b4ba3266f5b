"""Name → path catalog for ManagedTable roots — the reference's
catalog idiom (``saveAsTable`` + ``spark.table("geo")`` + ``DROP
TABLE``, 303-spark-sql/README.md:42-48) against versioned managed
tables, without path plumbing at call sites.

Spark's own catalog cannot host these tables (the managed layout is a
directory protocol, not a Hive provider, and the Python DataSource
API exposes no catalog plugin point), so the catalog is a small
durable name→entry store next to the data:

    catalog_root/
      _catalog/orders.json       {"path": ..., "options": {...}}
      orders/v=1/... v=2/...     (default data location)

``create_table`` registers (and optionally seeds) a table,
``table(name)`` opens its :class:`ManagedTable`, and ``bind(name)``
registers the CURRENT (or a pinned) snapshot as a temp view over a
NATIVE parquet scan (``ManagedTable.create_view``), after which plain
``spark.table(name)`` / ``spark.sql`` answer with Catalyst column
pruning and parquet filter pushdown. Binding pins the resolved
version — re-``bind`` (or query through :meth:`table`) to follow the
pointer after new commits, the same refresh discipline as
``REFRESH TABLE`` on an external catalog.

Entry files are written atomically (tmp + rename) and are the only
mutable state; everything else delegates to the managed facade's own
commit protocol, so catalog concurrency reduces to filesystem rename
atomicity plus the facade's writer lock.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

from bigdatalab_spark.sources.managed import ManagedTable

_CATALOG_DIR = "_catalog"
_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


class TableExistsError(ValueError):
    """CREATE TABLE on a name that is already registered."""


class ManagedCatalog:
    """A durable name→ManagedTable registry rooted at one directory.

    >>> cat = ManagedCatalog(spark, "/warehouse")
    >>> cat.create_table("events", df=events, index_cols=("user_id",))
    >>> cat.table("events").delete_range("user_id", 0, 9)
    >>> cat.bind("events")          # refresh the SQL surface
    >>> spark.table("events").groupBy("event_type").count()
    """

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, _CATALOG_DIR), exist_ok=True)

    # ---- DDL ---------------------------------------------------------------

    def create_table(
        self,
        name: str,
        df: DataFrame | None = None,
        path: str | None = None,
        partition_cols: tuple[str, ...] = (),
        if_not_exists: bool = False,
        **table_options,
    ) -> ManagedTable:
        """CREATE TABLE: register ``name`` (optionally at an external
        ``path`` — otherwise the data lives under the catalog root)
        and, when ``df`` is given, commit it as v=1 and bind the SQL
        view. ``table_options`` pass through to :class:`ManagedTable`
        (``index_cols``, ``link_mode``, ``isolation``, ...) and are
        remembered, so later :meth:`table` opens resolve identically
        from any process."""
        self._check_name(name)
        entry = self._entry_path(name)
        if os.path.exists(entry):
            if if_not_exists:
                return self.table(name)
            raise TableExistsError(
                f"table {name!r} already exists in catalog {self.root}"
            )
        path = path or os.path.join(self.root, name)
        tmp = entry + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump({"path": path, "options": table_options}, fh)
        os.replace(tmp, entry)  # registration is atomic: all-or-nothing
        t = ManagedTable(self.spark, path, **table_options)
        if df is not None:
            t.write(df, partition_cols=partition_cols)
            self.bind(name)
        return t

    def drop_table(self, name: str, purge: bool = False) -> None:
        """DROP TABLE: unregister the name (and drop its temp view).
        ``purge=True`` also deletes the data directory — the loud,
        explicit variant; the default leaves the versioned data in
        place, external-table style."""
        import shutil

        entry = self._read_entry(name)
        self.spark.catalog.dropTempView(name)
        os.remove(self._entry_path(name))
        if purge:
            shutil.rmtree(entry["path"], ignore_errors=True)

    # ---- resolution --------------------------------------------------------

    def tables(self) -> list[str]:
        """Registered table names, sorted (SHOW TABLES)."""
        d = os.path.join(self.root, _CATALOG_DIR)
        return sorted(
            e[: -len(".json")]
            for e in os.listdir(d)
            if e.endswith(".json")
        )

    def table(self, name: str) -> ManagedTable:
        """Open the named table with its remembered options."""
        entry = self._read_entry(name)
        return ManagedTable(
            self.spark, entry["path"], **entry["options"]
        )

    def bind(
        self,
        name: str,
        version: int | None = None,
        columns: list[str] | None = None,
    ) -> str:
        """Register ``name`` as a temp view over the table's resolved
        snapshot (native parquet scan, pinned) so ``spark.table(name)``
        and plain SQL answer against it. Returns the view name."""
        return self.table(name).create_view(
            name, version=version, columns=columns
        )

    # ---- internals ---------------------------------------------------------

    def _check_name(self, name: str) -> None:
        if not _NAME_RE.match(name):
            raise ValueError(
                f"invalid table name {name!r}: SQL identifier expected "
                "([A-Za-z_][A-Za-z0-9_]*)"
            )

    def _entry_path(self, name: str) -> str:
        return os.path.join(self.root, _CATALOG_DIR, f"{name}.json")

    def _read_entry(self, name: str) -> dict:
        self._check_name(name)
        try:
            with open(self._entry_path(name), encoding="utf-8") as fh:
                return json.load(fh)
        except FileNotFoundError:
            raise KeyError(
                f"no table {name!r} in catalog {self.root} "
                f"(have: {self.tables()})"
            ) from None
