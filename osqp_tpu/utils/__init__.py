"""Utilities: host-side reference implementations, timing, export helpers."""
