"""yaqs_tpu: TPU-native open-quantum-system MPS trajectory engine.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of MQT YAQS
(munich-quantum-toolkit/yaqs): analog open-system simulation via the Tensor
Jump Method on matrix-product states, noisy digital circuit simulation,
MPO-based equivalence checking, exact small-system backends (MCWF, Lindblad),
and memory/noise characterization — designed TPU-first (fixed shapes, jit,
vmap over trajectories, shard_map over device meshes).
"""

from __future__ import annotations

__version__ = "0.1.0"
version_info = (0, 1, 0)
