"""A Spark 4 Python DataSource replaying the reference's split-directory
ingestion as a first-class pluggable source.

The reference ships file chunks to workers by hand: the client cuts the
corpus into ``split{i}.txt`` files (/root/reference/SimpleClient.java:100-149),
round-robins one file per worker (SimpleClient.java:249-270), and each
worker re-reads its splits line-by-line
(/root/reference/WorkerSender.java:204-235). This source expresses that
exact ingestion contract — a directory of text split files, one input
partition per file, records = lines tagged with provenance — through
Spark's DataSource V2 Python API, so the scheduler (not hand-written socket
code) owns placement, retries and locality:

    spark.dataSource.register(TextSplitsDataSource)
    df = (spark.read.format("textsplits")
          .option("path", "/path/to/splits").load())
    # schema: split_file string, line_no long, value string

Why a custom source at all, when ``spark.read.text`` covers plain text?
Because it demonstrates the extension seam: any format Spark lacks plugs in
at exactly this point with partition planning under our control (here:
partition-per-file, mirroring the reference's unit of distribution). The
per-file provenance column is the piece ``spark.read.text`` only gives via
``input_file_name()``, and the line_no ordinal it does not give at all.

Scale note: Python data sources execute reader code in Python workers
(Arrow-batched back to the JVM) — right for long-tail formats, wrong for
hot-path bulk scans, where native parquet/csv readers keep vectorization
and pushdown. That hierarchy (native reader ≫ Python source) is the same
UDF-last principle as everywhere else in this engine.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class _SplitFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class TextSplitsReader(DataSourceReader):
    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("textsplits source requires .option('path', <dir>)")

    def partitions(self):
        # One input partition per split file — the reference's unit of
        # distribution (Split.java:9-13). Sorted for deterministic task
        # numbering; Spark schedules them independently.
        files = sorted(
            f
            for f in os.listdir(self.dir)
            if f.endswith(".txt") and os.path.isfile(os.path.join(self.dir, f))
        )
        return [_SplitFilePartition(os.path.join(self.dir, f)) for f in files]

    def read(self, partition):
        name = os.path.basename(partition.path)
        with open(partition.path, encoding="utf-8", errors="replace") as fh:
            for i, line in enumerate(fh):
                yield (name, i, line.rstrip("\n"))


@dataclass
class _SplitCommit(WriterCommitMessage):
    tmp_name: str
    final_name: str
    lines: int


class TextSplitsWriter(DataSourceWriter):
    """Writer half of the split-directory contract — the reference's O2
    (SimpleClient.java:100-149 cuts the corpus into ``split{i}.txt``), done
    with a real commit protocol instead of in-place writes: each task
    writes ``.inprogress-*`` temp files (invisible to the reader, which
    lists ``*.txt`` only), and the DRIVER's commit() renames them into
    place — so a retried/speculative task leaves garbage temps, never a
    torn or doubled split. abort() removes the temps. Requires storage all
    tasks can reach (local dir / NFS / fuse mount) — the same assumption
    the reference's rsync deployment made.
    """

    def __init__(self, options, overwrite: bool):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("textsplits sink requires .option('path', <dir>)")
        self.overwrite = overwrite

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tmp = f".inprogress-{pid}-{uuid.uuid4().hex}"
        os.makedirs(self.dir, exist_ok=True)
        n = 0
        with open(os.path.join(self.dir, tmp), "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write((row.value if row.value is not None else "") + "\n")
                n += 1
        return _SplitCommit(tmp_name=tmp, final_name=f"split{pid}.txt", lines=n)

    def commit(self, messages):
        # Publish rename-FIRST: os.replace is atomic per file and overwrites
        # any same-named previous split, so at no point does the directory
        # hold fewer splits than before — a crash mid-commit leaves a
        # readable mix of old+new, never a deleted-but-not-replaced dataset
        # (the old delete-before-rename ordering lost the previous dataset
        # on a crash between the two loops).
        published = set()
        for m in messages:
            os.replace(
                os.path.join(self.dir, m.tmp_name),
                os.path.join(self.dir, m.final_name),
            )
            published.add(m.final_name)
        if self.overwrite:
            # stale extras (previous run had MORE splits) go last
            for f in os.listdir(self.dir):
                if f.endswith(".txt") and f not in published:
                    os.remove(os.path.join(self.dir, f))

    def abort(self, messages):
        for m in messages:
            try:
                os.remove(os.path.join(self.dir, m.tmp_name))
            except FileNotFoundError:
                pass


class TextSplitsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "textsplits"

    def schema(self) -> str:
        return "split_file string, line_no long, value string"

    def reader(self, schema) -> TextSplitsReader:
        return TextSplitsReader(self.options)

    def writer(self, schema, overwrite: bool) -> TextSplitsWriter:
        names = [f.name for f in schema.fields]
        if "value" not in names:
            raise ValueError(
                f"textsplits sink requires a 'value' string column, got {names}"
            )
        return TextSplitsWriter(self.options, overwrite)


def register(spark) -> None:
    spark.dataSource.register(TextSplitsDataSource)


class TextSplitsStreamReader:
    """Streaming flavor of the split-directory ingestion: the reference's
    client feeds workers a FIXED split list once (SimpleClient.java:249-270);
    a streaming corpus drop-box generalizes that to files arriving over
    time. Offsets are positions in the sorted file listing ({"files_done":
    n}), so each microbatch reads exactly the newly-landed split files and
    restart-from-checkpoint resumes at a file boundary. Split files are
    immutable once written (the reference's assumption too), which is what
    makes the sorted-position offset exactly-once.

    Driver-side reads (SimpleDataSourceStreamReader) fit the split-file
    cardinality here; a high-rate source would use DataSourceStreamReader
    with planned partitions instead."""

    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("textsplits source requires .option('path', <dir>)")

    def _files(self):
        return sorted(
            f
            for f in os.listdir(self.dir)
            if f.endswith(".txt") and os.path.isfile(os.path.join(self.dir, f))
        )

    def initialOffset(self):
        return {"files_done": 0}

    def _read_files(self, names):
        # Materialized list, not a generator: the simple stream reader
        # prefetches on the driver and ships records by pickle.
        out = []
        for name in names:
            with open(
                os.path.join(self.dir, name), encoding="utf-8", errors="replace"
            ) as fh:
                out.extend(
                    (name, i, line.rstrip("\n")) for i, line in enumerate(fh)
                )
        return out

    def read(self, start):
        files = self._files()
        done = start["files_done"]
        batch = files[done:]
        # iter(list): the runner needs a real (and picklable) iterator.
        return iter(self._read_files(batch)), {"files_done": len(files)}

    def readBetweenOffsets(self, start, end):
        files = self._files()
        return iter(self._read_files(files[start["files_done"] : end["files_done"]]))

    def commit(self, end):
        pass


def _stream_reader(self, schema):
    return TextSplitsStreamReader(self.options)


TextSplitsDataSource.simpleStreamReader = _stream_reader
