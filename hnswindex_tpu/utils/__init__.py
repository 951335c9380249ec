"""Shared host-side utilities."""
