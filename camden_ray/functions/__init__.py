"""Vectorized scalar/text/similarity functions used inside map_batches stages."""
