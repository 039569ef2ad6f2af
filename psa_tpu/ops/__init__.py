"""Device compute paths (XLA + Pallas) and exact winner selection."""
