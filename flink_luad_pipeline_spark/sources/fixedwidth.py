"""Custom Python DataSource: fixed-width text records (Spark 4's
Python Data Source API).

The reference's source surface is CSV-ish files + driver collections
(Input.scala); this module demonstrates the Spark-4 extension point a
user needs when a feed speaks a format with NO built-in reader — the
classic mainframe/export fixed-width layout (every field padded to a
constant byte width, no delimiters). The source is a real, registered,
executor-side reader, not a driver-side preprocessor:

- ``partitions()`` lists the files once on the driver — one
  ``InputPartition`` per file, so a directory of N files fans out to N
  parallel read tasks exactly like the built-in text sources;
- ``read(partition)`` runs ON THE EXECUTORS, opening only its own file
  and yielding typed tuples (int fields parsed, strings right-trimmed
  of pad bytes);
- the declared schema drives Arrow conversion; no inference pass.

Options: ``path`` (file or directory), ``widths`` (comma-separated
byte widths, one per schema field). Blank/short lines AND full-length
lines whose declared-INT field is non-numeric (e.g. blank padding) are
skipped (malformed-row convention shared with the TSV scan, csv_io.py).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import IntegerType, LongType, StructType


class FixedWidthDataSource(DataSource):
    """``spark.read.format("fixedwidth")`` after registration."""

    @classmethod
    def name(cls) -> str:
        return "fixedwidth"

    def schema(self) -> str:
        # schema-first contract: the caller always passes .schema(...);
        # this default only satisfies the API when they don't.
        return "value STRING"

    def reader(self, schema: StructType) -> "FixedWidthReader":
        return FixedWidthReader(schema, self.options)


class FixedWidthReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("fixedwidth source requires option 'path'")
        widths = options.get("widths")
        if not widths:
            raise ValueError(
                "fixedwidth source requires option 'widths' "
                "(comma-separated byte widths, one per schema field)"
            )
        try:
            self._widths = [int(w) for w in widths.split(",")]
        except ValueError:
            raise ValueError(
                f"fixedwidth option 'widths' must be comma-separated "
                f"integers, got {widths!r}"
            ) from None
        if len(self._widths) != len(schema.fields):
            raise ValueError("one width per schema field required")
        if os.path.isdir(path):
            self._files = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if not f.startswith((".", "_"))
            )
        else:
            self._files = [path]
        self._ints = [
            isinstance(f.dataType, (IntegerType, LongType))
            for f in schema.fields
        ]

    def partitions(self) -> list[InputPartition]:
        # one partition per file: a directory fans out like built-in
        # text sources; a single giant file should be pre-split upstream
        # (fixed-width has no row-group index to split on)
        return [InputPartition(f) for f in self._files]

    def read(self, partition: InputPartition):
        rec_len = sum(self._widths)
        with open(partition.value, "r", encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if len(line) < rec_len:
                    continue  # malformed/short row: drop (csv_io rule)
                out, off = [], 0
                try:
                    for w, is_int in zip(self._widths, self._ints):
                        raw = line[off : off + w].rstrip()
                        out.append(int(raw) if is_int else raw)
                        off += w
                except ValueError:
                    continue  # non-numeric INT field: same drop rule
                yield tuple(out)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(FixedWidthDataSource)
