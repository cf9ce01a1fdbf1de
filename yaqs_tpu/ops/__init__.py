"""L1 numerical kernels: decompositions, truncation masks, Krylov propagators.

TPU-native replacements for the reference's core/linalg + Numba layer
(mqt-yaqs core/linalg/*, core/methods/matrix_exponential.py,
core/methods/lanczos_numba.py, core/methods/tdvp/numba.py): everything is
expressed as fixed-shape XLA ops so it fuses under jit and batches under vmap.
"""

from .decomp import (
    left_qr,
    merge_two_site,
    right_qr,
    split_matrix_truncated,
    split_two_site_truncated,
)
from .krylov import DEFAULT_KRYLOV_DIM, arnoldi_expm_apply, lanczos_expm_apply
from .truncation import TRUNC_MODES, keep_count, keep_mask

__all__ = [
    "DEFAULT_KRYLOV_DIM",
    "TRUNC_MODES",
    "arnoldi_expm_apply",
    "keep_count",
    "keep_mask",
    "lanczos_expm_apply",
    "left_qr",
    "merge_two_site",
    "right_qr",
    "split_matrix_truncated",
    "split_two_site_truncated",
]
