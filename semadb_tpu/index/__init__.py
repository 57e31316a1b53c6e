"""Concrete indices: vamana, flat, inverted, text + dispatch/search manager."""
