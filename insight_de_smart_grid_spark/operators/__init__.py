"""Operator library: pure DataFrame -> DataFrame functions (SURVEY §2, §7)."""
