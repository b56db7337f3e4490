"""Structured Streaming operators (SURVEY.md §B.9). Modules register queries
on import; batch-equivalence tests live in tests/test_streaming.py."""

from . import queries, stateful  # noqa: F401
