"""Composed pipelines (the reference-equivalent ETL DAG)."""
