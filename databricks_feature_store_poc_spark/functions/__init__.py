"""Scalar function suite + the Arrow-batched UDF surface.

Registered queries live in :mod:`.scalar`; importing it (via
registry.load_all_queries) is what populates the registry.
"""
