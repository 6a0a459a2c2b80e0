"""Materialization plans (incremental merge — SURVEY.md §2.1 S8)."""
