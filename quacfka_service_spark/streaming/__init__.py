"""Structured Streaming pipeline: the orchestrator analog (SURVEY.md §3.3)."""
