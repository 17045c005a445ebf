"""Wave 54: a custom Python DataSource (Spark 4 DataSource API) with
real partition planning and filter pushdown.

Spark 4 lets a pure-Python class BE a table provider —
`spark.dataSource.register` + `spark.read.format("recjournal")` — with
the same planner integration a JVM source gets: `partitions()` decides
task parallelism, `pushFilters()` receives Catalyst predicates and
returns the ones it could NOT handle (Spark keeps those as a residual
Filter; the accepted ones stop existing in the plan).  That is the
idiomatic Spark-4 answer to "my corpus is in a bespoke format" — no
JVM extension, no mapPartitions-over-binaryFile reimplementation of
split planning.

The format here ("recjournal") is a deliberately simple length-framed
binary record journal, one file per shard:

    ┌─────────┬──────────┬─────────┬───────────┬──────────┐
    │ i64 doc │ u16 llen │ lang…   │ i64 chars │ (repeat) │
    └─────────┴──────────┴─────────┴───────────┴──────────┘

* `partitions()` → one InputPartition per shard file: parallelism is
  the shard count, stated rather than hidden (the gzip lesson).
* `pushFilters()` → accepts `EqualTo(lang, …)` and `GreaterThan
  (n_chars, …)`, applies them record-by-record DURING the read (rows
  never reach Spark), and returns everything else as residual.
* `read()` → plain tuples; Arrow batches are the next gear when the
  per-row overhead matters.

Reference scope: §2B B1 source breadth (north-star); API from the
public PySpark 4 DataSource interface.
"""

from __future__ import annotations

import glob
import os
import struct
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    InputPartition,
    WriterCommitMessage,
)


def write_recjournal(rows, path: str, n_shards: int = 4) -> list[str]:
    """Fixture writer: rows of (doc_id, lang, n_chars) → n_shards
    journal files, sharded by doc_id % n_shards (driver-side fixture
    synthesis — a real journal is produced by its upstream system)."""
    os.makedirs(path, exist_ok=True)
    shards = [bytearray() for _ in range(n_shards)]
    for doc_id, lang, n_chars in rows:
        enc = lang.encode("utf-8")
        shards[doc_id % n_shards] += (
            struct.pack("<qH", doc_id, len(enc)) + enc
            + struct.pack("<q", n_chars)
        )
    out = []
    for i, buf in enumerate(shards):
        p = os.path.join(path, f"shard-{i:04d}.recj")
        with open(p, "wb") as fh:
            fh.write(bytes(buf))
        out.append(p)
    return out


def read_recjournal_file(path: str) -> Iterator[tuple[int, str, int]]:
    with open(path, "rb") as fh:
        data = fh.read()
    pos = 0
    while pos < len(data):
        if pos + 10 > len(data):
            raise ValueError(f"truncated record header in {path}")
        doc_id, llen = struct.unpack_from("<qH", data, pos)
        pos += 10
        if pos + llen + 8 > len(data):
            raise ValueError(f"truncated record body in {path}")
        lang = data[pos : pos + llen].decode("utf-8")
        pos += llen
        (n_chars,) = struct.unpack_from("<q", data, pos)
        pos += 8
        yield doc_id, lang, n_chars


class _ShardPartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class RecJournalReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("recjournal requires a path option")
        self.lang_eq: str | None = None
        self.chars_gt: int | None = None

    def pushFilters(self, filters):  # noqa: N802 (API name)
        residual = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("lang",):
                self.lang_eq = f.value
            elif isinstance(f, GreaterThan) and f.attribute == ("n_chars",):
                self.chars_gt = int(f.value)
            else:
                residual.append(f)
        return residual

    def partitions(self) -> Sequence[InputPartition]:
        files = sorted(glob.glob(os.path.join(self.path, "*.recj")))
        if not files:
            raise ValueError(f"no .recj shards under {self.path}")
        return [_ShardPartition(p) for p in files]

    def read(self, partition: _ShardPartition):
        for doc_id, lang, n_chars in read_recjournal_file(partition.path):
            if self.lang_eq is not None and lang != self.lang_eq:
                continue
            if self.chars_gt is not None and n_chars <= self.chars_gt:
                continue
            yield doc_id, lang, n_chars


class _ShardCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int) -> None:
        self.path = path
        self.n_rows = n_rows


class RecJournalWriter(DataSourceWriter):
    """Distributed journal write: each Spark task streams its rows into
    one shard file under a task-unique STAGED name, and `commit()` —
    which runs only after every task succeeded — renames the staged
    shards into the `.recj` namespace the reader globs.  Tasks that
    never reach commit leave only `.staged` files the reader ignores:
    the same publish-by-rename atomicity the IVF store uses."""

    def __init__(self, options: dict, overwrite: bool = False) -> None:
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("recjournal requires a path option")
        self.overwrite = overwrite
        # per-commit prefix: shards from distinct commits can never
        # collide, so append mode accumulates instead of clobbering
        # shard-0000, and overwrite mode can identify stale shards
        # from prior commits by prefix (r10 advice: a fixed shard-%04d
        # namespace left old higher-numbered shards behind and the
        # reader glob silently mixed two commits)
        self.commit_id = uuid.uuid4().hex[:12]

    def write(self, iterator) -> _ShardCommit:
        import uuid

        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(self.path, f"part-{uuid.uuid4().hex}.staged")
        n = 0
        with open(staged, "wb") as fh:
            for row in iterator:
                enc = row.lang.encode("utf-8")
                fh.write(
                    struct.pack("<qH", row.doc_id, len(enc)) + enc
                    + struct.pack("<q", row.n_chars)
                )
                n += 1
        return _ShardCommit(staged, n)

    def commit(self, messages) -> None:
        import glob as _glob

        stale = (
            set(_glob.glob(os.path.join(self.path, "*.recj")))
            if self.overwrite
            else set()
        )
        for i, m in enumerate(sorted(messages, key=lambda m: m.path)):
            dest = os.path.join(
                self.path, f"shard-{self.commit_id}-{i:04d}.recj"
            )
            os.replace(m.path, dest)
            stale.discard(dest)
        # overwrite: drop every shard from prior commits once the new
        # ones are published (new shards first so a concurrent reader
        # never sees an empty directory mid-swap)
        for old in stale:
            try:
                os.remove(old)
            except OSError:
                pass

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.path)
            except OSError:
                pass


class RecJournalDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "recjournal"

    def schema(self) -> str:
        return "doc_id long, lang string, n_chars long"

    def reader(self, schema) -> RecJournalReader:
        return RecJournalReader(self.options)

    def writer(self, schema, overwrite: bool) -> RecJournalWriter:
        return RecJournalWriter(self.options, overwrite=overwrite)


def register_recjournal(spark) -> None:
    """Idempotent registration (re-register is a no-op overwrite).
    Python-source filter pushdown ships behind a runtime flag in
    Spark 4 — a reader that implements pushFilters() without it is an
    AnalysisException, so registration turns it on (session-scoped
    runtime conf, same mechanism as io.sources.apply_runtime_confs)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(RecJournalDataSource)
