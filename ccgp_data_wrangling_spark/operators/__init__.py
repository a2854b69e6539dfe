"""Operator library (SURVEY.md §2): the custom operators Spark lacks
natively, each built as a composition of DataFrame primitives —
linkage join, MERGE-on-parquet, dedup family, ANN search, read-pair
explode, summary reports.
"""
