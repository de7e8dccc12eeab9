"""Custom Python Data Source WRITER (Spark ≥4.0) — the sink half of the
connector surface (`sources/generator.py` is the reader half; the
reference's only sink is parquet, py:137).

``jsonl_audit`` writes a DataFrame as partition-local JSONL files under a
real two-phase commit protocol:

- each task writes ``_tmp_<uuid>.jsonl`` and returns a commit message
  (temp path, final name, row count);
- ``commit()`` (driver, runs once — only for tasks that SUCCEEDED)
  renames temps to ``part-<i>.jsonl`` and writes a ``_SUCCESS`` manifest
  with the total row count;
- ``abort()`` deletes whatever temps the failed attempt left behind.

A reader that lists only ``part-*.jsonl`` (or checks ``_SUCCESS``) never
observes a torn write — the same task-commit discipline every production
sink (parquet's FileOutputCommitter, Iceberg/Delta snapshots) implements,
demonstrated at Python-data-source scale. JSONL keeps ints/strings
lossless, so a write→read-back roundtrip is exactly checkable against a
DuckDB oracle computed straight from the source table.

At 100 TB: writes are partition-local (no shuffle added by the sink);
the commit is O(tasks) renames on the driver — the known metadata-commit
bottleneck every file committer shares; object-store deployments swap the
rename for a manifest write, same protocol shape.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _Committed(WriterCommitMessage):
    tmp_path: str
    rows: int


class AuditJsonlWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool = False) -> None:
        self._path = options.get("path")
        self._overwrite = overwrite
        if not self._path:
            raise ValueError("jsonl_audit requires a 'path' option")

    def write(self, iterator):
        os.makedirs(self._path, exist_ok=True)
        tmp = os.path.join(self._path, f"_tmp_{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), sort_keys=True,
                                   default=str))
                f.write("\n")
                n += 1
        return _Committed(tmp_path=tmp, rows=n)

    def commit(self, messages) -> None:
        import glob
        import re

        succ = os.path.join(self._path, "_SUCCESS")
        if self._overwrite:
            # honor overwrite SEMANTICS at commit time: stale part files
            # from a previous commit would otherwise survive and a
            # part-*.jsonl reader would see mixed old+new rows while
            # _SUCCESS claims a clean commit
            for stale in glob.glob(os.path.join(self._path, "part-*.jsonl")):
                os.remove(stale)
            if os.path.exists(succ):
                os.remove(succ)
            start, prior_rows, prior_parts = 0, 0, 0
        else:
            # append mode: never clobber a previous commit's parts —
            # continue numbering after the committed prefix and roll the
            # prior manifest's counts into the new one, so a part-*.jsonl
            # reader always sees exactly what _SUCCESS claims. Parts are
            # numbered sequentially from 0, so the committed state is
            # exactly parts 0..prior_parts-1; any part numbered past that
            # is an ORPHAN from a commit that crashed after renaming but
            # before writing _SUCCESS — its data was never committed, so
            # it is removed here (leaving it would make _SUCCESS
            # undercount what a glob reader sees).
            prior_rows, prior_parts = 0, 0
            existing = []
            for p in glob.glob(os.path.join(self._path, "part-*.jsonl")):
                m = re.search(r"part-(\d+)\.jsonl$", p)
                if m:
                    existing.append((int(m.group(1)), p))
            if os.path.exists(succ):
                with open(succ, "r", encoding="utf-8") as f:
                    prior = json.load(f)
                prior_rows = int(prior.get("rows", 0))
                if "parts" in prior:
                    prior_parts = int(prior["parts"])
                else:
                    # foreign/hand-written manifest without 'parts':
                    # every existing part file is COMMITTED state, not
                    # an orphan — continue numbering after the highest
                    # existing part instead of deleting them all. Its
                    # 'rows' field can't be trusted either (ADVICE r9
                    # #3): recount by line-counting the kept parts
                    # (bounded, local JSONL) so the rewritten manifest
                    # matches what a glob reader actually sees.
                    prior_parts = (
                        max(n for n, _ in existing) + 1 if existing else 0
                    )
                    prior_rows = 0
                    for _, p in existing:
                        with open(p, "r", encoding="utf-8") as pf:
                            prior_rows += sum(1 for _ln in pf)
            for num, p in existing:
                if num >= prior_parts:
                    os.remove(p)
            start = prior_parts
        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(self._path, f"part-{start + i:05d}.jsonl")
            os.replace(m.tmp_path, final)
            total += m.rows
        with open(succ, "w") as f:
            json.dump({"rows": prior_rows + total,
                       "parts": prior_parts + len(messages)}, f)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class AuditJsonlDataSource(DataSource):
    """Register with ``spark.dataSource.register(AuditJsonlDataSource)``
    and write via ``df.write.format("jsonl_audit").option("path", p)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_audit"

    def writer(self, schema, overwrite: bool):
        return AuditJsonlWriter(self.options, overwrite=overwrite)
