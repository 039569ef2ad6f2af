"""Search engines: single-query and batched."""
