"""Equivalence checking: scalable MPO backend + dense matrix backend."""

from .checker import EquivalenceChecker, EquivalenceCheckResult

__all__ = ["EquivalenceChecker", "EquivalenceCheckResult"]
