"""Structured Streaming extension surface (SURVEY.md §2.11)."""
