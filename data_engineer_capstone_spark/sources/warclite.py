"""WARC-lite custom Python data source (Spark 4 DataSource API).

LLM-corpus pipelines ingest web crawls as WARC (Common Crawl's format);
Spark has no built-in WARC reader. This module registers ``warclite`` — a
pure-Python `DataSource` for the WARC *response-record* subset that
curation actually consumes: one row per record with the target URI, the
capture timestamp, declared content type, and the raw payload as an opaque
``binary`` column (multimodal convention, see ``operators/multimodal.py``).

Format handled (a strict, simplified WARC/1.0 profile):

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Target-URI: <uri>\r\n
    WARC-Date: <ISO-8601>\r\n
    Content-Type: <mime>\r\n
    Content-Length: <n>\r\n
    \r\n
    <n payload bytes>\r\n\r\n

Scale notes: `partitions()` returns ONE InputPartition PER FILE, so a
directory of crawl segments fans out across the cluster exactly like the
built-in file sources (Common Crawl ships ~1 GiB segment files — a good
task size); each task streams its file sequentially (WARC is a
concatenated record stream — not splittable mid-file without an index, the
same property gzip'd WARC has in every production reader). Non-`response`
records are skipped at the source so downstream sees only usable rows.
The row batches cross into the JVM over Arrow (the DataSource API's
transport), so payload bytes are not pickled row-by-row.

No counterpart exists in the reference (its sources are CSV/JSON/parquet —
`/root/reference/scripts/pyspark.py:160-177`); this is part of the
LLM-pipeline extension surface.
"""

from __future__ import annotations

import glob as _glob
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("record_id", LongType(), False),  # ordinal within file
        StructField("file", StringType(), False),
        StructField("url", StringType(), True),
        StructField("warc_date", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def parse_warc_stream(fh, file_name: str) -> Iterator[tuple]:
    """Yield (record_id, file, url, date, content_type, payload) from one
    simplified-WARC byte stream. Driver- and executor-safe pure function."""
    rid = 0
    while True:
        line = fh.readline()
        if not line:
            return
        if line.strip() != b"WARC/1.0":
            continue  # skip inter-record padding / unknown bytes
        headers: dict[str, str] = {}
        while True:
            h = fh.readline()
            if not h or h.strip() == b"":
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        length = int(headers.get("content-length", "0"))
        payload = fh.read(length) if length else b""
        if headers.get("warc-type") == "response":
            yield (
                rid,
                file_name,
                headers.get("warc-target-uri"),
                headers.get("warc-date"),
                headers.get("content-type"),
                payload,
            )
            rid += 1


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("warclite: 'path' option (file, dir, or glob) required")
        if os.path.isdir(path):
            path = os.path.join(path, "*.warc")
        self.paths = sorted(_glob.glob(path)) or [path]

    def partitions(self) -> Sequence[InputPartition]:
        # one task per segment file — the crawl-archive parallelism unit
        return [_WarcFilePartition(p) for p in self.paths]

    def read(self, partition: _WarcFilePartition) -> Iterator[tuple]:
        name = os.path.basename(partition.path)
        with open(partition.path, "rb") as fh:
            yield from parse_warc_stream(fh, name)


class _WarcStreamReader(DataSourceStreamReader):
    """Streaming ingest of an arriving-segments directory.

    Offset model: segment files are immutable once written (the crawl
    convention) and processed in sorted-name order; the offset is simply
    ``{"n": <count of files ingested so far>}``. Each micro-batch plans one
    InputPartition per NEW file — parsing runs on executors, the driver
    only lists the directory. Exactly-once per file given the
    sorted-immutable contract; late/renamed files violate it and belong to
    a compaction step upstream, as with Spark's own file source.
    """

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("warclite: 'path' option required")
        if os.path.isdir(path):
            path = os.path.join(path, "*.warc")
        self.pattern = path

    def _files(self) -> list[str]:
        return sorted(_glob.glob(self.pattern))

    def initialOffset(self) -> dict:
        return {"n": 0}

    def latestOffset(self) -> dict:
        return {"n": len(self._files())}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        files = self._files()[start["n"]: end["n"]]
        return [_WarcFilePartition(p) for p in files]

    def read(self, partition: _WarcFilePartition) -> Iterator[tuple]:
        name = os.path.basename(partition.path)
        with open(partition.path, "rb") as fh:
            yield from parse_warc_stream(fh, name)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean: files are immutable, offset is positional


class WarcLiteDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warclite"

    def schema(self) -> StructType:
        return WARC_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _WarcReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _WarcStreamReader(self.options)


def register_warclite(spark) -> None:
    """Register the source: ``spark.read.format('warclite').load(path)`` or
    ``spark.readStream.format('warclite').load(path)`` (arriving segments)."""
    spark.dataSource.register(WarcLiteDataSource)
