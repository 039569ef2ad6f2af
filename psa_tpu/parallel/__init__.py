"""Multi-chip / multi-host scaling: mesh sharding and collectives."""
