"""Core semantics: alphabet encoding, scoring tables, exact oracle, results."""
