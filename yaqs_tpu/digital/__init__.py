"""L4 digital engine: circuit IR, QASM loading, compilation, TEBD simulation."""
