"""Operator tooling (dataset preparation, config fixups)."""
