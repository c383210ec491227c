"""End-to-end pipelines composed from stages (the engine's query surface)."""
