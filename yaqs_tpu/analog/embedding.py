"""Dense operator embedding into the full Hilbert space (site 0 = LSB).

Convention matches :func:`yaqs_tpu.core.mps_ops.to_statevector` and the
reference's kron order (mqt-yaqs analog/utils.py:417-, site 0 least
significant): embedding op at site i gives
``I_{L-1} x ... x op_i x ... x I_0`` with site index increasing in kron
significance.
"""

from __future__ import annotations

import numpy as np

__all__ = ["embed_operator", "embed_one_site"]


def embed_one_site(op: np.ndarray, site: int, length: int, d: int = 2) -> np.ndarray:
    m = np.eye(1, dtype=np.complex128)
    for i in range(length):
        o = np.asarray(op, dtype=np.complex128) if i == site else np.eye(d)
        m = np.kron(o, m)
    return m


def embed_operator(ops: dict[int, np.ndarray], length: int, d: int = 2) -> np.ndarray:
    """Embed a product of one-site operators ``{site: op}``."""
    m = np.eye(1, dtype=np.complex128)
    for i in range(length):
        o = np.asarray(ops[i], dtype=np.complex128) if i in ops else np.eye(d)
        m = np.kron(o, m)
    return m
