"""Custom Python Data Source (Spark 4 API): the keyed-staging reader.

The one place SURVEY.md §4 flags where a custom source is justified:
the reference's staging layout is one JSON object per ``{id}.json`` file
(app.py:84–92, 204–208) — a layout Spark's built-in JSON reader handles
only as whole-text globs with no partition planning. This DataSource
reads that layout as a proper table:

- ``schema()``   declares the entity schema (strict landing contract);
- ``partitions()`` plans one InputPartition per file *batch* (not per
  file — a million 1-KB objects must not become a million tasks);
- ``reader()``   parses each batch with the declared schema, yielding
  tuples.

Registered as the ``keyed_json`` format:

    spark.dataSource.register(KeyedJsonDataSource)
    df = (spark.read.format("keyed_json")
          .schema(ARTISTS_SCHEMA)
          .option("path", f"{staging}/artists")
          .load())

Scale note: batch size bounds per-task memory and the partition count
adapts to the listing — the small-files problem is absorbed at planning
time. (Listing itself is driver-side, as with every file source.)
"""

from __future__ import annotations

import json
import os

try:  # Spark 4 Python Data Source API
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    _HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover - older Spark
    _HAS_DATASOURCE_API = False

    class DataSource:  # type: ignore[no-redef]
        pass

    class DataSourceReader:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        def __init__(self, value):
            self.value = value


FILES_PER_PARTITION = 256


class _FileBatch(InputPartition):
    def __init__(self, paths: list[str]) -> None:
        self.paths = paths


class KeyedJsonReader(DataSourceReader):
    def __init__(self, schema, options) -> None:
        self._schema = schema
        path = options.get("path")
        if not path:
            raise ValueError("keyed_json requires .option('path', <dir>)")
        self._dir = path
        self._batch = int(options.get("filesperpartition", FILES_PER_PARTITION))

    def partitions(self):
        files = sorted(
            os.path.join(self._dir, f)
            for f in os.listdir(self._dir)
            if f.endswith(".json")
        )
        return [
            _FileBatch(files[i : i + self._batch])
            for i in range(0, len(files), self._batch)
        ] or [_FileBatch([])]

    def read(self, partition: _FileBatch):
        field_names = [f.name for f in self._schema.fields]
        for path in partition.paths:
            with open(path, encoding="utf-8") as fh:
                obj = json.load(fh)
            yield tuple(_conform(obj.get(name), self._schema[name].dataType)
                        for name in field_names)


def _conform(value, dtype):
    """Minimal JSON→Spark conformance for nested struct/array fields."""
    from pyspark.sql import types as T

    if value is None:
        return None
    if isinstance(dtype, T.StructType):
        return tuple(
            _conform(value.get(f.name), f.dataType) for f in dtype.fields
        )
    if isinstance(dtype, T.ArrayType):
        return [_conform(v, dtype.elementType) for v in value]
    if isinstance(dtype, T.LongType):
        return int(value)
    if isinstance(dtype, T.DoubleType):
        return float(value)
    if isinstance(dtype, T.BooleanType):
        return bool(value)
    return str(value)


class KeyedJsonDataSource(DataSource):
    """spark.read.format("keyed_json") — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "keyed_json"

    def schema(self):
        raise NotImplementedError(
            "keyed_json has no default schema; pass .schema(ENTITY_SCHEMAS[e])"
        )

    def reader(self, schema) -> KeyedJsonReader:
        return KeyedJsonReader(schema, self.options)
