"""Sources: table readers with schema validation + deterministic fixtures."""
