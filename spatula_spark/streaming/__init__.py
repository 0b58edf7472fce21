"""Structured Streaming operators (stretch surface; the reference is
strictly batch — SURVEY.md §2.6)."""
