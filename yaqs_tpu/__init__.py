"""yaqs_tpu: TPU-native open-quantum-system MPS trajectory engine.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of MQT YAQS
(munich-quantum-toolkit/yaqs): analog open-system simulation via the Tensor
Jump Method on matrix-product states, noisy digital circuit simulation,
MPO-based equivalence checking, exact small-system backends (MCWF, Lindblad),
and memory/noise characterization — designed TPU-first (fixed shapes, jit,
vmap over trajectories, shard_map over device meshes).

Public API parity with the reference facade (mqt-yaqs __init__.py:37-55).
"""

from __future__ import annotations

from . import simulator
from .core.hamiltonian import Hamiltonian
from .core.mpo import MPO
from .core.mps import MPS
from .core.noise_model import NoiseModel
from .core.result import Result
from .core.sim_params import (
    SIMULATION_PRESETS,
    AnalogSimParams,
    DigitalSimParams,
    Observable,
)
from .core.state import State
from .equivalence import EquivalenceChecker
from .memory_characterizer import MemoryCharacterizer
from .noise_characterizer import NoiseCharacterizer
from .simulator import Simulator

__version__ = "0.1.0"
version_info = (0, 1, 0)

__all__ = [
    "MPO",
    "MPS",
    "SIMULATION_PRESETS",
    "AnalogSimParams",
    "DigitalSimParams",
    "EquivalenceChecker",
    "Hamiltonian",
    "MemoryCharacterizer",
    "NoiseCharacterizer",
    "NoiseModel",
    "Observable",
    "Result",
    "Simulator",
    "State",
    "__version__",
    "simulator",
    "version_info",
]
