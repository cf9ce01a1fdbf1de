"""Characterization: Markovian noise fitting + non-Markovian memory probing."""
