"""Libraries: operator matrices, Hamiltonian factories, benchmark circuits."""
