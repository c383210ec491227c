"""Dataset sources (readers) for the engine."""
