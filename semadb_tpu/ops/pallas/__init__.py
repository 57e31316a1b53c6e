"""Pallas TPU kernels for hot ops (with XLA fallbacks)."""
