"""Ray Data batch-transform stages (stateless tasks + actor pools)."""
