"""Deterministic data generators for parity tests (reference's telco schema)."""
