"""Operator library.

Each module registers demo queries into a ``QUERIES``/``ORACLES`` pair via
``registry.demo_query``; ``__spark_entry__.py`` merges them all. Query names
map 1:1 to SURVEY.md §2 operator IDs (noted in each docstring).
"""

from __future__ import annotations
