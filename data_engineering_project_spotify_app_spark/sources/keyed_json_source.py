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

All three directions of the format are implemented:

- batch read   (``reader``): batched per-file parsing, see above;
- batch write  (``writer``): one ``{key}.json`` object per row — the
  reference's exact staging layout — with write-then-rename atomicity
  per object, a commit manifest, and abort cleanup;
- stream read  (``simpleStreamReader``): tail the staging directory as
  a micro-batch source with an mtime high-water-mark offset.

Registered as the ``keyed_json`` format:

    spark.dataSource.register(KeyedJsonDataSource)
    df = (spark.read.format("keyed_json")
          .schema(ARTISTS_SCHEMA)
          .option("path", f"{staging}/artists")
          .load())
    df.write.format("keyed_json").option("path", out).mode("append").save()
    s = (spark.readStream.format("keyed_json")
         .schema(ARTISTS_SCHEMA).option("path", out).load())

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
        DataSourceStreamWriter,
        DataSourceWriter,
        InputPartition,
        SimpleDataSourceStreamReader,
        WriterCommitMessage,
    )

    _HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover - older Spark
    _HAS_DATASOURCE_API = False

    class DataSource:  # type: ignore[no-redef]
        pass

    class DataSourceReader:  # type: ignore[no-redef]
        pass

    class DataSourceWriter:  # type: ignore[no-redef]
        pass

    class DataSourceStreamWriter:  # type: ignore[no-redef]
        pass

    class SimpleDataSourceStreamReader:  # type: ignore[no-redef]
        pass

    class WriterCommitMessage:  # type: ignore[no-redef]
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


class _WroteFiles(WriterCommitMessage):
    """Per-task commit message: which keyed files the task wrote."""

    def __init__(self, names: list[str]) -> None:
        self.names = names


class KeyedJsonWriter(DataSourceWriter):
    """Batch writer producing the reference's exact staging layout: one
    ``{key}.json`` object per row (app.py:84-92, 204-208).

    The key column names the file, so the write is idempotent per row —
    a retried task rewrites the same paths instead of duplicating
    (upgrade over the reference's at-least-once thread pool, which could
    leave partial alien state; here ``commit`` records the full manifest
    and ``abort`` can reconcile). No shuffle is imposed: each partition
    writes its own rows, so upstream partitioning (e.g. by entity or
    date) carries straight through to file placement.
    """

    def __init__(self, schema, options, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("keyed_json requires .option('path', <dir>)")
        self._dir = path
        self._key = options.get("keycolumn", "id")
        self._field_names = [f.name for f in schema.fields]
        if self._key not in self._field_names:
            raise ValueError(
                f"key column {self._key!r} not in schema {self._field_names}"
            )
        self._overwrite = overwrite

    def write(self, iterator) -> _WroteFiles:
        os.makedirs(self._dir, exist_ok=True)
        names = []
        for row in iterator:
            obj = row.asDict(recursive=True)
            key = obj[self._key]
            if key is None:
                raise ValueError("keyed_json cannot write a NULL key row")
            name = f"{key}.json"
            # write-then-rename: readers of the directory never observe a
            # torn object (rename is atomic within a filesystem)
            tmp = os.path.join(self._dir, f".{name}.tmp")
            with open(tmp, "w", encoding="utf-8") as fh:
                json.dump(obj, fh)
            os.replace(tmp, os.path.join(self._dir, name))
            names.append(name)
        return _WroteFiles(names)

    def commit(self, messages) -> None:
        written = {
            name for msg in messages if msg is not None for name in msg.names
        }
        manifest_path = os.path.join(self._dir, "_MANIFEST")
        if self._overwrite:
            # snapshot semantics: the new manifest IS the directory —
            # remove stale {id}.json objects from prior commits so
            # manifest == files holds after re-staging an entity
            for name in os.listdir(self._dir):
                if name.endswith(".json") and name not in written:
                    try:
                        os.remove(os.path.join(self._dir, name))
                    except FileNotFoundError:
                        pass
        else:
            # append/upsert semantics: merge the prior manifest so keys
            # staged by earlier commits stay listed (their files are
            # still on disk; keyed writes only ever upsert in place)
            try:
                with open(manifest_path) as fh:
                    written.update(
                        line for line in fh.read().splitlines() if line
                    )
            except FileNotFoundError:
                pass
        manifest = sorted(written)
        with open(manifest_path, "w") as fh:
            fh.write("\n".join(manifest) + ("\n" if manifest else ""))

    def abort(self, messages) -> None:
        # keyed writes are idempotent; a retry overwrites. Remove files
        # from tasks that DID report, so a failed job leaves no orphans.
        for msg in messages:
            if msg is None:
                continue
            for name in msg.names:
                try:
                    os.remove(os.path.join(self._dir, name))
                except FileNotFoundError:
                    pass


class KeyedJsonStreamWriter(DataSourceStreamWriter):
    """Streaming writer: every micro-batch lands/refreshes ``{key}.json``
    objects in place — the continuously-updated staging directory.

    Exactly-once per key: the filename IS the key, so a replayed batch
    rewrites the same objects (write-then-rename keeps concurrent readers
    safe). ``commit`` appends one line per batch to ``_BATCHES`` — the
    audit trail of which epochs are durable, the streaming twin of the
    batch writer's ``_MANIFEST``.
    """

    def __init__(self, schema, options) -> None:
        self._inner = KeyedJsonWriter(schema, options, overwrite=False)
        self._dir = self._inner._dir

    def write(self, iterator) -> _WroteFiles:
        return self._inner.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        n = sum(len(m.names) for m in messages if m is not None)
        with open(os.path.join(self._dir, "_BATCHES"), "a") as fh:
            fh.write(f"{batchId}\t{n}\n")

    def abort(self, messages, batchId: int) -> None:
        # keyed writes are idempotent: the retried batch rewrites the
        # same paths, so leave files in place (removing could race the
        # retry); the batch simply never appears in _BATCHES
        pass


class KeyedJsonStreamReader(SimpleDataSourceStreamReader):
    """Streaming reader for the keyed staging layout.

    Progress is tracked with a modification-time high-water mark — the
    offset is ``{"mtime_ns": N, "at_mark": [names]}``: a micro-batch
    reads every file strictly newer than the mark plus same-instant
    files not yet seen (``at_mark`` keeps the offset bounded: only files
    sharing the max mtime are listed, not the whole history — the same
    trick as log-structured file sources). Files must be immutable once
    written (the staging contract: write-then-rename, see
    KeyedJsonWriter).
    """

    def __init__(self, schema, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("keyed_json requires .option('path', <dir>)")
        self._dir = path
        self._schema = schema
        self._field_names = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"mtime_ns": -1, "at_mark": []}

    def _list_newer(self, offset: dict):
        mark, at_mark = offset["mtime_ns"], set(offset["at_mark"])
        out = []
        if os.path.isdir(self._dir):
            for name in os.listdir(self._dir):
                if not name.endswith(".json"):
                    continue
                full = os.path.join(self._dir, name)
                m = os.stat(full).st_mtime_ns
                if m > mark or (m == mark and name not in at_mark):
                    out.append((m, name, full))
        out.sort()
        return out

    def _rows(self, files):
        for _, _, full in files:
            with open(full, encoding="utf-8") as fh:
                obj = json.load(fh)
            yield tuple(
                _conform(obj.get(name), self._schema[name].dataType)
                for name in self._field_names
            )

    def read(self, start: dict):
        files = self._list_newer(start)
        if not files:
            return iter(()), start
        new_mark = files[-1][0]
        at_mark = [n for m, n, _ in files if m == new_mark] + (
            start["at_mark"] if new_mark == start["mtime_ns"] else []
        )
        end = {"mtime_ns": new_mark, "at_mark": sorted(set(at_mark))}
        # a LIST iterator, not a generator: the simple-stream runner both
        # iterates the result (next()) and pickles it into its prefetch
        # cache — list iterators satisfy both, generators can't pickle
        return iter(list(self._rows(files))), end

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay for recovery: same listing rule, bounded above by `end`
        mark, at_mark = end["mtime_ns"], set(end["at_mark"])
        files = [
            (m, n, f)
            for m, n, f in self._list_newer(start)
            if m < mark or (m == mark and n in at_mark)
        ]
        return list(self._rows(files))


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

    def writer(self, schema, overwrite: bool) -> KeyedJsonWriter:
        return KeyedJsonWriter(schema, self.options, overwrite)

    def simpleStreamReader(self, schema) -> KeyedJsonStreamReader:
        return KeyedJsonStreamReader(schema, self.options)

    def streamWriter(self, schema, overwrite: bool) -> KeyedJsonStreamWriter:
        return KeyedJsonStreamWriter(schema, self.options)
