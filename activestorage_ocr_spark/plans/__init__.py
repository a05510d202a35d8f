"""Driver-contract query registry (queries + DuckDB oracles)."""
