"""Capture .explain("formatted") for named queries into plans/r13/.

Usage: python tools/capture_plans.py <suffix> <query> [<query> ...]
Writes plans/r13/<query>_<suffix>.txt (suffix: before|after).

Building a query's DataFrame runs its eager fixture work (index
writes, training collects), so this is also a smoke test of the
query-construction path.
"""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from georiva_spark.queries import QUERIES  # noqa: E402
from georiva_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r13")
    # the BEFORE capture runs from a read-only worktree of the old
    # commit: always write into the MAIN repo's plans/r13
    out_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR", out_dir)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("georiva-plans")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
