"""Shared utilities: checkpoint format, profiling helpers."""
