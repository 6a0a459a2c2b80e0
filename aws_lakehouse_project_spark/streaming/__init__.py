"""Structured Streaming operators (SURVEY.md §2.9 extension)."""
