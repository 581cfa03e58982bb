"""L3 algorithm engines (one module per program family)."""
