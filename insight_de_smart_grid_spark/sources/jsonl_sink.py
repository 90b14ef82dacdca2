"""Manifest-committed JSONL sink/source (Spark 4 Python DataSource API).

`sources/corpus.py` reads/writes JSONL through Spark's built-in json
reader; THIS module demonstrates the other half of the custom-source story
the REDD reader (`redd_source.py`) started: a **writer** with a real commit
protocol. Each task writes its own ``part-<uuid>.jsonl`` and returns a
commit message; the driver's ``commit`` writes ``_MANIFEST.json`` listing
exactly the files that belong to the committed dataset. Readers trust ONLY
the manifest, so a task that wrote a file and then failed (its retry wrote
a second copy) leaves an orphan that is never read — the same
atomic-visibility contract Delta/Iceberg build on a transaction log, in
~100 lines of Python source API.

At cluster scale: one file per task (no driver data path), manifest write
is a single small driver-side file, and the reader parallelizes one input
partition per manifest entry.

Reference analog: the producers' file-handoff into Kafka
(`ingestion/producer_REDD_avro.py:161-184`) has at-least-once semantics;
the manifest commit is the engine-side upgrade.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

MANIFEST = "_MANIFEST.json"


@dataclass
class JsonlCommit(WriterCommitMessage):
    file_name: str
    n_rows: int


class JsonlWriter(DataSourceWriter):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator: Iterator) -> JsonlCommit:
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(Path(self.path) / name, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str,
                                   sort_keys=True))
                f.write("\n")
                n += 1
        return JsonlCommit(file_name=name, n_rows=n)

    def commit(self, messages) -> None:
        entries = sorted((m.file_name, m.n_rows)
                         for m in messages if m is not None)
        manifest = {"files": [{"file": f, "n_rows": n} for f, n in entries],
                    "n_rows": sum(n for _, n in entries)}
        tmp = Path(self.path) / f".{MANIFEST}.{uuid.uuid4().hex}.tmp"
        tmp.write_text(json.dumps(manifest, indent=1))
        # atomic on POSIX: the manifest appears fully written or not at all
        os.replace(tmp, Path(self.path) / MANIFEST)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    (Path(self.path) / m.file_name).unlink()
                except OSError:
                    pass


class JsonlFilePartition(InputPartition):
    def __init__(self, file_path: str) -> None:
        self.file_path = file_path


class JsonlReader(DataSourceReader):
    """Reads ONLY manifest-listed files — orphans from failed/retried tasks
    are invisible by construction."""

    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema = schema
        self.path = options["path"]

    def partitions(self):
        manifest = json.loads((Path(self.path) / MANIFEST).read_text())
        return [JsonlFilePartition(str(Path(self.path) / e["file"]))
                for e in manifest["files"]]

    def read(self, partition: JsonlFilePartition):
        names = [f.name for f in self.schema.fields]
        with open(partition.file_path, encoding="utf-8") as f:
            for line in f:
                d = json.loads(line)
                yield tuple(d.get(n) for n in names)


class JsonlManifestDataSource(DataSource):
    """``spark.read/write.format("jsonl_manifest").option("path", dir)``.

    The write side requires ``.option("path", ...)`` rather than
    ``.save(path)`` (the Python API surfaces save paths through options).
    The read side needs an explicit ``.schema(...)`` (JSONL carries no
    types)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def schema(self) -> str:
        raise NotImplementedError(
            "jsonl_manifest requires an explicit read schema")

    def reader(self, schema: StructType) -> JsonlReader:
        return JsonlReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> JsonlWriter:
        return JsonlWriter(self.options)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlManifestDataSource)
