"""Operator library: pure DataFrame→DataFrame functions, no engine state.

Mirrors the reference's geoprocessing package invariant (importable without
the web framework — test_no_django.py): these import without a SparkSession.
"""
