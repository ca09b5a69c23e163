"""Operator corpus: each module registers driver queries via registry.query."""
