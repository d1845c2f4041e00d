#!/usr/bin/env python
"""Capture .explain('formatted') for named queries to plans/<tag>/<id>_<suffix>.txt.

Usage: python tools/plan_capture.py --tag r11 --suffix before [name ...]
Defaults to the bench HEADLINE suite when no names are given.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r11")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import big_data_management_and_analytics_spark as engine
    from big_data_management_and_analytics_spark.sources.session import get_spark

    engine.load_all()
    reg = engine.all_queries()
    names = args.names
    if not names:
        import bench

        names = list(bench.HEADLINE) + list(bench.EXACT_BASELINES)
    spark = get_spark("plan_capture")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = reg[name].fn(spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        txt = buf.getvalue()
        n_ex = txt.count("Exchange")
        n_py = sum(txt.count(k) for k in ("BatchEvalPython", "ArrowEvalPython"))
        n_mip = txt.count("MapInPandas") + txt.count("PythonMapInArrow")
        print(f"{name}: exchanges={n_ex} pyeval={n_py} mapin={n_mip} -> {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
