"""
Device/layout helpers shared by all kernels: TPU-friendly padding (lane dim
128, sublane 8), capacity scheduling for growable device arrays, and dtype
policy.
"""
from __future__ import annotations

import numpy as np

LANE = 128
SUBLANE = 8

# Row-capacity quantum: device row counts are always 1024 * 2^m so any two
# capacities (and the scan chunk size) divide each other — keeps the jit
# cache small and streaming chunking exact.
_CAP_BASE = 1024


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pad_dim(d: int) -> int:
    """Pad feature dim to a multiple of the TPU lane width (128)."""
    return max(round_up(d, LANE), LANE)


def capacity_for(n: int) -> int:
    """Smallest 1024*2^m >= n."""
    cap = _CAP_BASE
    while cap < n:
        cap *= 2
    return cap


def pad_rows_np(mat: np.ndarray, rows: int, cols: int,
                dtype=np.float32) -> np.ndarray:
    """Zero-pad a host matrix to (rows, cols)."""
    n, d = mat.shape
    out = np.zeros((rows, cols), dtype=dtype)
    out[:n, :d] = mat
    return out


def stage1_precision() -> str:
    """Stage-1 dot mode for the fused flat scan (ops/pallas_scan.PRECISIONS):
    'split3' by default (3-pass split-bf16, ~1e-5 relative score noise vs
    a k+8 segment margin); SMQTK_TPU_STAGE1=highest|split3|native
    overrides ('highest' = provably exact Mosaic f32 lowering, ~5x the
    cost; 'native' = raw bf16 pass, only safe for bf16-stored data)."""
    import os
    v = os.environ.get("SMQTK_TPU_STAGE1", "split3")
    if v not in ("native", "split3", "highest"):
        # Exactness-sensitive users must not silently get the
        # approximate default off a typo.
        raise ValueError(
            f"SMQTK_TPU_STAGE1={v!r}: must be one of "
            "'native' | 'split3' | 'highest'.")
    return v


def tpu_kernel_enabled(env_flag: str) -> bool:
    """Shared gate for optional TPU-only kernels: not disabled by the given
    env var, and the default jax backend is a real TPU."""
    import os
    if os.environ.get(env_flag):
        return False
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
