"""Capture .explain("formatted") for registry queries to files.

Usage: python tools/capture_plans.py OUT_DIR [suffix] [query ...]

Writes OUT_DIR/<name>_<suffix>.txt for every registry entry (or the
listed subset). The suffix is "before"/"after" during an optimization
round so a reviewer can diff plan shapes without running Spark.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from syzgydb_spark.session import get_spark


def main():
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    os.makedirs(out_dir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = E.queries()
    names = sorted(only) if only else sorted(qs.keys())
    for name in names:
        if name not in qs:
            print(f"skip {name}: not a registry entry", file=sys.stderr)
            continue
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
