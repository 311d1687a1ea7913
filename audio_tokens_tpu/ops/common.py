"""Shared op-level helpers."""

from __future__ import annotations


def round_up(x: int, m: int) -> int:
    """Smallest multiple of m that is >= x."""
    return -(-x // m) * m


def bf16_peak_flops(default: float = 197e12) -> float:
    """Per-chip bf16 matmul peak for the current accelerator (MFU
    denominator); falls back to the v5e figure when unknown."""
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return default
    table = {
        "v6": 918e12,
        "v5p": 459e12,
        "v5 lite": 197e12,  # v5e reports 'TPU v5 lite'
        "v5e": 197e12,
        "v4": 275e12,
    }
    for key, peak in table.items():
        if key in kind:
            return peak
    return default
