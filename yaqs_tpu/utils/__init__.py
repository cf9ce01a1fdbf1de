"""Shared utilities (host transfer helpers, etc.)."""
