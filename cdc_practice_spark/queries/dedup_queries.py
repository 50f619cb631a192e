"""Filled in by a later milestone."""
