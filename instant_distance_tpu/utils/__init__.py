"""Utilities: reference oracle, serialization, metrics, datasets."""
