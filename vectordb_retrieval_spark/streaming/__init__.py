"""Structured Streaming extensions (not reference parity — the
reference is batch-only, SURVEY.md §2.9 — but the serving shape a
production retrieval engine needs)."""
