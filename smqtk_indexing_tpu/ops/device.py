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
    """Round ``x`` up to the next multiple of ``m``.

    >>> round_up(130, 128)
    256
    >>> round_up(128, 128)
    128
    """
    return -(-x // m) * m


def pow2_at_least(x: int, lo: int = 1) -> int:
    """Smallest power of two >= ``x``, floored at ``lo`` (itself assumed a
    power of two). The shape-rounding primitive every store uses to bound
    jit-cache growth on batch/k/window dims.

    >>> pow2_at_least(5)
    8
    >>> pow2_at_least(3, lo=8)
    8
    """
    p = lo
    while p < x:
        p *= 2
    return p


def pad_dim(d: int) -> int:
    """Pad feature dim to a multiple of the TPU lane width (128).

    >>> pad_dim(100)
    128
    >>> pad_dim(300)
    384
    """
    return max(round_up(d, LANE), LANE)


def capacity_for(n: int) -> int:
    """Smallest 1024*2^m >= n.

    >>> capacity_for(1)
    1024
    >>> capacity_for(3000)
    4096
    """
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


def kernel_tier() -> str:
    """Which tier the Pallas compute kernels run at in this process:

    - ``"tpu-pallas"`` — the default backend is a real TPU; the DMA/MXU
      kernels run natively (the production configuration).
    - ``"cpu-interpret"`` — no TPU; the identical programs execute
      through the Pallas interpreter / XLA-CPU fallbacks. Correct, and
      what CI exercises, but orders of magnitude slower — a service
      operator should not serve traffic from this tier.
    - ``"unavailable"`` — jax itself failed to initialize a backend.
    """
    try:
        import jax
        return "tpu-pallas" if jax.default_backend() == "tpu" \
            else "cpu-interpret"
    except Exception:  # pragma: no cover - broken jax install
        return "unavailable"


def device_report(flags: tuple = ()) -> dict:
    """Honest runtime-capability report shared by every impl's
    ``usability_report()`` (the reference gates ``is_usable()`` on
    backend importability, faiss.py:86-89; here the backend always
    imports but may be DEGRADED — this is the distinguishing signal).

    :param flags: env-var kill switches relevant to the caller (e.g.
        ``("SMQTK_TPU_NO_FUSED",)``); any that are set are reported and
        mark the impl degraded.
    :return: dict with ``backend``, ``devices``, ``kernel_tier``,
        ``disabled_flags`` and the summary bool ``degraded`` (True when
        not running the native TPU kernel tier or any engine is
        flag-disabled).
    """
    import os
    tier = kernel_tier()
    try:
        import jax
        backend = jax.default_backend()
        n_dev = len(jax.devices())
    except Exception:  # pragma: no cover - broken jax install
        backend, n_dev = None, 0
    disabled = [f for f in flags if os.environ.get(f)]
    return {
        "backend": backend,
        "devices": n_dev,
        "kernel_tier": tier,
        "disabled_flags": disabled,
        "degraded": tier != "tpu-pallas" or bool(disabled),
    }


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
