"""Scene model and render engines (megakernel / wavefront / oracle)."""
