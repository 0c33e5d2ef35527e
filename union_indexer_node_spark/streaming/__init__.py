"""Structured Streaming wrappers (SURVEY §2.9 T1-T7)."""
