"""Filled in by the streaming milestone."""
