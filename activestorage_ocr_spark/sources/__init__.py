"""Table sources/sinks and session construction."""
