"""Shared column-expression helpers (JVM-side, codegen-friendly)."""
