"""Per-query driver-side profiler (r13 optimization round).

Usage: python tools/profile_query.py <query> [<query> ...]

Runs each query once to warm codegen/fixtures, then a second timed run
under cProfile, and prints the top driver-side call sites by cumulative
time.  Because every Spark action blocks the driver in a py4j
send_command, the profile attributes wall time to the exact operator
call (collect / saveAsTable / count) that caused each job — the
per-phase breakdown the Spark UI would give, without a UI.
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from georiva_spark.queries import QUERIES  # noqa: E402
from georiva_spark.session import get_spark  # noqa: E402


def force_rows(df):
    from pyspark.sql import functions as F
    return (df.select(F.xxhash64(*df.columns).alias("h"))
            .agg(F.count("h").alias("n"), F.bit_xor("h"))
            .collect()[0]["n"])


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("georiva-profile")
    spark.range(1).count()
    import pandas
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pandas.Series) -> pandas.Series:
        return s
    spark.range(32).select(_warm("id")).count()

    for name in names:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        force_rows(fn(spark, sf_dir))
        warm = time.perf_counter() - t0

        pr = cProfile.Profile()
        t0 = time.perf_counter()
        pr.enable()
        force_rows(fn(spark, sf_dir))
        pr.disable()
        hot = time.perf_counter() - t0

        print(f"\n##### {name}: warm {warm:.2f}s, profiled {hot:.2f}s")
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s)
        ps.sort_stats("cumulative")
        ps.print_stats(
            r"(georiva_spark|queries_ext)", 40)
        # also the raw py4j blocking profile: who waited on the JVM
        ps.print_stats(r"java_gateway.*send_command", 3)
        print(s.getvalue())


if __name__ == "__main__":
    main()
