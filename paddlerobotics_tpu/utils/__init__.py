"""Shared utilities: logging, profiling, numeric guards."""
