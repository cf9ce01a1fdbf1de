"""L3 tensor-network methods: TDVP/BUG integrators, dissipation, jumps."""
