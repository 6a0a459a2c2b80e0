"""Engine error types.

``ExpectationFailure`` mirrors the reference's fail-fast validation error
(reference ``local_runner.py:43-44``): a violated data-quality expectation
aborts the pipeline before transform/publish.
"""

from __future__ import annotations


class EngineError(RuntimeError):
    """Base class for engine errors."""


class ExpectationFailure(EngineError):
    """A data-quality expectation was violated (fail-fast gate)."""


class SchemaContractError(EngineError):
    """A table's columns do not match its ordered-column contract."""
