"""Internal dev tools (reference: internal/ — loaders, dumpers, bridges)."""
