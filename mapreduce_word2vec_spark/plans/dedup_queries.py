"""Placeholder — filled in during the round-1 build."""
