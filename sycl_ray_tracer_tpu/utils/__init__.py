"""Host-side utilities: asset ingest, image IO, logging, CLI."""
