"""Shared device-op library (noise, blurs, reductions, sorting helpers)."""
