"""Per-fold cost of the incremental dedup loop as the stored band index
grows (round 15 — evidence for the 'per-fold I/O is O(batch), never a
corpus rewrite' claim and for the auto-compaction cadence):

    python scripts/stress_index.py [sf_dir] [n_batches] [compact_every]

Folds the documents table through ``dedup_index_fold`` in ``n_batches``
equal batches (doc_id mod n) into a throwaway store, printing per fold:
wall seconds, the number of dirs a NEW reader would union (the fan-in
the cadence bounds), and the accumulated index row count. With the
default cadence the fan-in saw-tooths under compact_every + 1 and the
fold wall stays flat; with ``compact_every=0`` (disabled) the fan-in
grows one dir per batch — the shape the cadence exists to prevent.
Findings recorded in PLANS.md §Round 15.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    compact_every = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from kafka_workers_spark import WorkersConfig, build_session
    from kafka_workers_spark.sources.files import load_table
    from kafka_workers_spark.streaming.dedup_index import (
        _list_parts,
        dedup_index_fold,
    )

    spark = build_session(WorkersConfig(app_name="stress_index"))
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()

    root = tempfile.mkdtemp(prefix="kw_stress_index_", dir="/dev/shm")
    index_dir = os.path.join(root, "band_index")
    cc_dir = os.path.join(root, "cc_store")
    fold = dedup_index_fold(
        spark,
        index_dir,
        cc_dir,
        lineage="stress",
        compact_every=compact_every or None,
    )
    print(
        f"corpus {sf_dir} ({n_docs} docs), {n_batches} batches, "
        f"compact_every={compact_every or 'disabled'}",
        flush=True,
    )
    print(f"{'batch':>5} {'wall_s':>7} {'reader_dirs':>11} {'index_rows':>10}")
    try:
        for b in range(n_batches):
            t0 = time.perf_counter()
            fold(docs.filter(f"pmod(doc_id, {n_batches}) = {b}"), b)
            wall = time.perf_counter() - t0
            parts = _list_parts(index_dir, None)
            rows = spark.read.parquet(*parts).count() if parts else 0
            print(f"{b:>5} {wall:>7.2f} {len(parts):>11} {rows:>10}", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
