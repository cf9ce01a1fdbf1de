"""Markovian noise characterization: CMA-ES fit of Lindblad rates."""
