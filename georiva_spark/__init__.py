"""georiva_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of wmo-raf/georiva, rebuilt Spark-first.

Raster grids are long-format partitioned DataFrames (SURVEY.md §1.4);
georiva's operators (SURVEY.md §2) are DataFrame/SQL operations. The
package imports without creating a SparkSession (mirrors the reference's
no-Django invariant, georiva/src/georiva/geoprocessing/tests/test_no_django.py:13-30).
"""

__version__ = "0.1.0"
