"""Frequent Directions matrix sketch (Liberty KDD'13; Ghashami,
Liberty, Phillips & Woodruff, SICOMP'16) — the deterministic streaming
sketch for covariance/PCA at corpus scale: an ℓ×d matrix B such that

    0 ⪯ AᵀA − BᵀB   and   ‖AᵀA − BᵀB‖₂ ≤ ‖A‖_F² − ‖B‖_F²

— i.e. the sketch's Gram UNDERESTIMATES the true Gram in the PSD
order, and the spectral error is bounded by the total mass the shrink
steps removed. Crucially for Spark, FD sketches are MERGEABLE: stack
two sketches and shrink again, and both properties still hold (the
SICOMP mergeability theorem) — so per-partition sketches + one tiny
merge give the streaming-equivalent result with bounded state
(ℓ·d doubles per task), no matter the corpus size.

Numerics contract: SVD outputs are engine-local floats, so nothing
float-valued from the sketch crosses the oracle boundary — consumers
emit the exact-integer inputs (grid-quantized Frobenius mass, row
counts) plus BOOLEANS of the two guarantees, checked against the
EXACT Gram (operators/similarity.py gram_matrix, integer cells). The
booleans hold for ANY partition order by the theorems above, so they
are deterministic even though the sketch itself is not.
"""

from __future__ import annotations

import numpy as np


def fd_shrink(M: np.ndarray, ell: int) -> np.ndarray:
    """One FD shrink: SVD of the stacked rows, subtract the ℓ-th
    squared singular value from every σ², keep the top ℓ directions.
    Rows beyond what exists pad implicitly (zero rows are dropped by
    callers before stacking)."""
    M = M[np.any(M != 0.0, axis=1)] if len(M) else M
    if M.shape[0] <= ell:
        return M.copy()
    _, s, vt = np.linalg.svd(M, full_matrices=False)
    delta = s[ell - 1] ** 2 if s.shape[0] >= ell else 0.0
    s2 = np.sqrt(np.maximum(s * s - delta, 0.0))
    keep = min(ell, vt.shape[0])
    return s2[:keep, None] * vt[:keep]


def fd_partition_sketch(batch_iter, ell: int, d: int):
    """mapInPandas body: fold each Arrow batch of quantized vectors into a
    running ℓ×d sketch; emit the partition's sketch rows."""
    import pandas as pd

    B = np.zeros((0, d))
    for pdf in batch_iter:
        if not len(pdf):
            continue
        rows = np.asarray(pdf["qv"].tolist(), dtype=np.float64)
        B = fd_shrink(np.vstack([B, rows]), ell)
    yield pd.DataFrame(
        {"r": np.arange(len(B), dtype="int32"), "v": [row.tolist() for row in B]}
    )
