"""Host utilities: file I/O, CLI, data generation, rendering, profiling."""
