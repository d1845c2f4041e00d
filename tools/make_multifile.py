#!/usr/bin/env python
"""Materialize a multi-file copy of a fixture directory.

The driver fixtures are one parquet FILE per table; at production scale
every table is thousands of files. This tool splits each table into a
DIRECTORY named ``{table}.parquet/`` holding several part files — the
layout ``spark.read.parquet`` and DuckDB's glob both accept — so the
differential sweep can certify file-layout invariance: same values no
matter how rows are sliced across files or which file lists first.

Two deliberate stressors:

- Part file NAMES reverse the row order: part-00 holds the LAST row
  slice. Spark lists files lexicographically, so rows arrive in a
  different global order than the single-file fixture — any operator
  whose result depends on arrival order (unseeded rand, first() without
  a window, monotonically_increasing_id leakage) diverges here.
- Slices are unequal (the first file is ~half the table, the rest split
  the remainder) so per-file row counts differ from any uniform
  repartition assumption.

pyarrow read/write preserves the physical schema (including the
timestamp unit the events table was generated with), so the engine's
unit-dispatch load path sees exactly what the original file had.

With ``--hive``, three tables additionally use the hive-partitioned
layout (``{table}.parquet/{col}={val}/part-*.parquet``), the layout
real lakehouses prune on: orders by o_orderstatus, lineitem by
l_returnflag, documents by lang. Partition VALUES must be hive-safe
(no URL-escaping needed): pyarrow percent-encodes special characters
in directory names, Spark decodes them back but DuckDB's
hive_partitioning does NOT — a cross-engine trap this tool refuses to
write rather than paper over. Within each partition the same
reversed/unequal file split applies.

Usage: python tools/make_multifile.py [--src /root/testdata/sf0.01]
                                      [--dst /tmp/mf_sf0.01] [--files 8]
                                      [--hive]
"""

from __future__ import annotations

import argparse
import os
import re

import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Hive-partition columns per table (--hive): low-cardinality string
# columns whose values are hive-safe. events stays flat — the streaming
# FileStreamSource reads it as a flat directory.
HIVE_COLS = {
    "orders": "o_orderstatus",
    "lineitem": "l_returnflag",
    "documents": "lang",
}

# Hive-safe partition values: printable path-safe chars, and NOT
# shaped like anything Spark's partition-column type inference (or
# DuckDB's hive type autocast) would coerce away from STRING — Spark
# then fails loud in load()'s schema check, DuckDB's side of check.py
# would silently change the column type even with autocast pinned off
# elsewhere. Fail at fixture-creation time instead (ADVICE r7).
# ADVICE r8 widened the rejection beyond purely-numeric: signed numerics
# ('-12'), scientific notation ('1e5', '1.5E-3'), and date/timestamp
# shapes ('2024-01-01') all coerce too. Rather than chase each lexical
# family, reject any value the inference could read as a non-string:
# an optional sign + digits/dots/exponent (covers int, double, sci),
# and the ISO date prefix dddd-dd-dd.
_HIVE_SAFE = re.compile(
    # int / double / scientific, with Java's optional [fFdD] suffix —
    # Double.parseDouble accepts '1f'/'2d' (ADVICE r9)
    r"^(?![+-]?[0-9.]+([eE][+-]?[0-9]+)?[fFdD]?$)"
    r"(?![0-9]{4}-[0-9]{2}-[0-9]{2})"  # ISO date(/timestamp) prefix
    # Java's special doubles: NaN / Inf(inity), optional sign, any case
    r"(?![+-]?(?i:nan|inf(?:inity)?)$)"
    # hex-float prefix ('0x1p3' parses as DoubleType); reject any 0x/0X
    # lead rather than modeling the full hex-significand grammar
    r"(?![+-]?0[xX])"
    r"[A-Za-z0-9._-]+$"
)


def split_table(src_file: str, dst_dir: str, n_files: int) -> int:
    return _split(pq.read_table(src_file), dst_dir, n_files)


def split_table_hive(src_file: str, dst_dir: str, col: str, n_files: int) -> int:
    """Hive-partitioned split: one {col}={val}/ subdir per distinct value,
    the partition column dropped from the data files (hive convention),
    the same reversed/unequal split applied inside each partition."""
    t = pq.read_table(src_file)
    vals = sorted(set(t.column(col).to_pylist()))
    total = 0
    for v in vals:
        assert isinstance(v, str) and _HIVE_SAFE.match(v), (
            f"{col}={v!r} is not hive-safe: pyarrow would percent-encode it, "
            "Spark would decode it back, DuckDB would NOT — pick another column"
        )
        part = t.filter(pc.equal(t.column(col), v)).drop_columns([col])
        total += _split(
            part, os.path.join(dst_dir, f"{col}={v}"), max(1, n_files // 2)
        )
    return total


def _split(t, dst_dir: str, n_files: int) -> int:
    rows = t.num_rows
    n = max(1, min(n_files, rows))
    os.makedirs(dst_dir, exist_ok=True)
    # Unequal slices: first slice ~half, remainder split evenly.
    bounds = [0, max(1, rows // 2)] if n > 1 else [0]
    rest = rows - bounds[-1]
    for i in range(1, n):
        bounds.append(bounds[-1] + rest // (n - 1) + (1 if i <= rest % (n - 1) else 0))
    bounds.append(rows) if n == 1 else None
    if bounds[-1] != rows:
        bounds[-1] = rows
    slices = [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]
    # Reverse: lexicographically-first file name gets the LAST slice.
    for name_idx, (lo, hi) in enumerate(reversed(slices)):
        pq.write_table(
            t.slice(lo, hi - lo),
            os.path.join(dst_dir, f"part-{name_idx:02d}.parquet"),
        )
    return len(slices)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.01")
    ap.add_argument("--dst", default="/tmp/mf_sf0.01")
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument("--hive", action="store_true")
    args = ap.parse_args()

    for t in TABLES:
        src = os.path.join(args.src, f"{t}.parquet")
        dst = os.path.join(args.dst, f"{t}.parquet")
        if args.hive and t in HIVE_COLS:
            n = split_table_hive(src, dst, HIVE_COLS[t], args.files)
            print(f"{t}: {n} part files (hive by {HIVE_COLS[t]}) -> {dst}")
        else:
            n = split_table(src, dst, args.files)
            print(f"{t}: {n} part files -> {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
