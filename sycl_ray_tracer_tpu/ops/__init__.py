"""Compute kernels and math primitives (JAX/XLA + Pallas)."""
