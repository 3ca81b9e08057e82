"""Structured Streaming operators (extension scope — the reference has no
streaming surface, SURVEY.md §2.9)."""
