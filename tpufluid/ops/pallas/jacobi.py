"""Fused Pallas Jacobi pressure solve (placeholder gate until the kernel lands)."""

from __future__ import annotations


def supported(shape) -> bool:
    return False


def jacobi_pressure(pressure, div, iterations):  # pragma: no cover - gated off
    raise NotImplementedError
