"""Shared column-expression helpers (all JVM-side, no Python UDFs)."""
