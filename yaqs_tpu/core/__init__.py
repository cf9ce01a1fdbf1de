"""L2 data structures: padded MPS/MPO arrays and user-facing state/operator specs."""
