"""Structured Streaming twins of the batch operators (SURVEY.md §2.9)."""
