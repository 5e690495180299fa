"""Structured Streaming surface (SURVEY §2.9, §7 M5)."""
