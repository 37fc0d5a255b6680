"""Placeholder — filled in by milestone build-out."""

QUERIES: dict = {}
ORACLES: dict = {}
