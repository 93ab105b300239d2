"""Reusable column/DataFrame helpers that are not operators themselves:
skew mitigation (functions/skew.py) and any cross-module expression
builders.  Operators stay in operators/; this package holds the
building blocks a pipeline author composes."""

from .skew import salted_aggregate, salted_join  # noqa: F401
