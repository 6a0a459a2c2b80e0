"""Data-quality gates (SURVEY.md §2.11 D1-D3)."""
