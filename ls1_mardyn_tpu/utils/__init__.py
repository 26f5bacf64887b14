"""Cross-cutting utilities: logging, hierarchical timers, RNG."""
