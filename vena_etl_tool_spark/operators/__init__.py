"""Operator modules. Importing this package registers every query.

Module map (SURVEY.md §2 Part B):
- pricing        §B.4 flagship hash aggregate (M0)
"""

from . import pricing  # noqa: F401
