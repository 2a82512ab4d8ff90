"""Sources & sinks: frontier store, synthetic fetch, fixtures (SURVEY §2.1)."""
