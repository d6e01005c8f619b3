"""Collectives wrappers vs numpy oracles on the 8-fake-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.dist.collectives import (
    all_gather_axis,
    all_reduce_sum,
    all_to_all_axis,
    halo_exchange,
    ring_shift,
)
from davo_tpu.dist.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


@pytest.fixture
def x(rng):
    return jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)


class TestCollectives:
    def test_all_reduce_sum(self, mesh, x):
        out = np.asarray(all_reduce_sum(x, mesh))
        want = np.broadcast_to(np.asarray(x).sum(0, keepdims=True), x.shape)
        np.testing.assert_allclose(out, want, rtol=1e-6)

    def test_all_gather(self, mesh, x):
        out = np.asarray(all_gather_axis(x, mesh))
        np.testing.assert_allclose(out, np.asarray(x), rtol=1e-6)

    def test_ring_shift(self, mesh, x):
        out = np.asarray(ring_shift(x, mesh, shift=1))
        xs = np.asarray(x).reshape(8, 2, 4)
        want = np.roll(xs, 1, axis=0).reshape(16, 4)
        np.testing.assert_allclose(out, want, rtol=1e-6)

    def test_halo_exchange(self, mesh, x):
        left, right = halo_exchange(x, mesh, halo=1)
        left, right = np.asarray(left), np.asarray(right)
        xs = np.asarray(x).reshape(8, 2, 4)
        for i in range(8):
            if i == 0:
                np.testing.assert_allclose(left[i], 0.0)
            else:
                np.testing.assert_allclose(left[i], xs[i - 1, -1], rtol=1e-6)
            if i == 7:
                np.testing.assert_allclose(right[i], 0.0)
            else:
                np.testing.assert_allclose(right[i], xs[i + 1, 0], rtol=1e-6)

    def test_all_to_all(self, mesh, rng):
        x = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
        out = np.asarray(all_to_all_axis(x, mesh))
        xn = np.asarray(x)
        # Device d owned rows [2d, 2d+2); afterwards it owns column d.
        # Global result: out[:, d] column assembled from all row blocks.
        np.testing.assert_allclose(out, xn, rtol=1e-6)
