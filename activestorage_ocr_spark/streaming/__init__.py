"""Structured Streaming surface for continuous page ingestion."""
