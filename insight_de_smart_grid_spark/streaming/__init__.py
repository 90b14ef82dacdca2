"""Structured Streaming parity layer (SURVEY §2.7 ST1-ST8)."""
