"""Deterministic synthetic page corpus + golden fixture generation."""
