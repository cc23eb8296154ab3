"""Multi-chip scaling over jax.sharding.Mesh (ICI collectives)."""
