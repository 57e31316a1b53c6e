"""Host-side utilities: comparison/sorting, config, backup."""
