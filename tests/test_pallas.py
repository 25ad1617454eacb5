"""Pallas kernels vs the jnp oracle (interpret mode on CPU; the driver's TPU
bench exercises the compiled path)."""

from unittest import mock

import numpy as np
import jax.numpy as jnp
import pytest

import tpufluid.ops.pallas.jacobi as pj
from tpufluid.ops import stencil


def _interp(module):
    orig = module.pl.pallas_call
    return mock.patch.object(module.pl, "pallas_call",
                             lambda *a, **k: orig(*a, interpret=True, **k))


@pytest.mark.parametrize("shape", [(64, 128), (128, 256), (512, 128)])
@pytest.mark.parametrize("iters", [1, 7, 20])
def test_jacobi_matches_oracle(shape, iters, rng):
    p = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    d = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    with _interp(pj):
        got = pj.jacobi_pressure(p, d, iters)
    want = stencil.jacobi_pressure(p, d, iters)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6)


def test_jacobi_supported_gate():
    assert pj.supported((1024, 1024))
    assert pj.supported((128, 128))
    assert not pj.supported((228, 128))   # demo 1280x720 sim grid: H % 8 != 0
    assert not pj.supported((128, 100))   # lane-unaligned width


def test_jacobi_zero_iters_identity(rng):
    p = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    d = jnp.zeros((64, 128), jnp.float32)
    out = pj.jacobi_pressure(p, d, 0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(p))
