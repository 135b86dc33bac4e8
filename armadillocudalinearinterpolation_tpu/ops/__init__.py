"""Standalone ops: batched interpolation kernels (jnp reference + Pallas)."""
