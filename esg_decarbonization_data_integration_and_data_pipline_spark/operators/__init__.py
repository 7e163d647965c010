"""Operator library: Spark-first re-expressions of SURVEY.md §2."""
