"""Scalar/UDF function families (SURVEY.md §2.9-2.10)."""
