"""Operator library: transforms, enrichment, salting, dedup, similarity, text.

Each module re-expresses a reference capability (SURVEY.md §2) or a
training-data-pipeline operation the north rule calls for, Spark-first:
JVM builtins where possible, Arrow-vectorized pandas UDFs where not,
never row-at-a-time Python.
"""
