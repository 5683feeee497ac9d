"""Logical-plan builders: view lattice + history/snapshot query algebra."""
