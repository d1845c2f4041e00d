"""Multi-file fixture layout invariance (round 7).

The driver fixtures are one parquet file per table; production tables
are thousands of files. tools/make_multifile.py materializes the
directory-of-part-files layout with two stressors (file-name order
reverses row order; slices are unequal), and these tests pin that a
representative operator sample — plain agg, window, LSH dedup, the
metadata-column rollup, and a live streaming query through the
directory-aware read_events_stream — produces IDENTICAL values on both
layouts. The full multi-file differential sweep (all 428 oracle-tier
ids vs DuckDB) is a SCALE.md certification artifact; this keeps the
capability from regressing between certification runs.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

from tests.conftest import SF_SMALL

_TOOL = os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools", "make_multifile.py")


def _load_tool():
    spec = importlib.util.spec_from_file_location("make_multifile", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def mf_dir(tmp_path_factory):
    """Multi-file copy of the sf0.001 fixtures (reversed, unequal parts)."""
    tool = _load_tool()
    dst = str(tmp_path_factory.mktemp("mf_sf0001"))
    for t in tool.TABLES:
        n = tool.split_table(
            os.path.join(SF_SMALL, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
            4,
        )
        assert n >= 1
    return dst


def _rows(df):
    return sorted(tuple(map(repr, r)) for r in df.collect())


@pytest.mark.parametrize(
    "qid",
    [
        "agg_pricing_summary",
        "win_running_sum",
        "llm_dedup_minhash",
        "stream_tumbling_live",
    ],
)
def test_layout_invariance(spark, registry, mf_dir, qid):
    single = _rows(registry[qid].fn(spark, SF_SMALL))
    multi = _rows(registry[qid].fn(spark, mf_dir))
    assert single == multi


def test_metadata_rollup_is_layout_independent(spark, registry, mf_dir):
    """scan_metadata_cols groups by the TABLE-level path segment, so one
    file and a 4-part directory both report ('lineitem.parquet', total)."""
    single = {r["file_name"]: r["n_rows"]
              for r in registry["scan_metadata_cols"].fn(spark, SF_SMALL).collect()}
    multi = {r["file_name"]: r["n_rows"]
             for r in registry["scan_metadata_cols"].fn(spark, mf_dir).collect()}
    assert single == multi
    assert set(single) == {"lineitem.parquet"}


def test_multifile_scan_has_multiple_input_files(spark, mf_dir):
    """The stressor is real: the multi-file lineitem scan reads >1 file
    (distinct _metadata.file_path), so the invariance tests above are
    exercising a genuinely split input, not a degenerate single part."""
    from pyspark.sql import functions as F

    from big_data_management_and_analytics_spark.sources.io import load

    n = (
        load(spark, mf_dir, "lineitem")
        .select(F.col("_metadata.file_path"))
        .distinct()
        .count()
    )
    assert n >= 2
