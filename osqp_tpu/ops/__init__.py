"""Pallas TPU kernels for the solver hot paths."""
