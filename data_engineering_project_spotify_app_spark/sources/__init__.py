"""Sources & sinks: NDJSON staging ⇄ managed tables (reference S6/S7)."""
