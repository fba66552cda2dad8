"""Auxiliary subsystems: profiling, tracing, stats, settings."""
