"""Tests for the Pallas TPU kernels (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sclmd_tpu.ops import kernels as K

pytestmark = pytest.mark.skipif(not K.HAVE_PALLAS,
                                reason="pallas unavailable")


class TestConvMatmul:
    @pytest.mark.parametrize("shape", [(90, 900, 2), (64, 2048, 17),
                                       (8, 128, 128), (5, 100, 3)])
    def test_matches_dense(self, rng, shape):
        m, k, p = shape
        a = rng.normal(size=(m, k)).astype(np.float32)
        b = rng.normal(size=(k, p)).astype(np.float32)
        got = np.asarray(K.conv_matmul(jnp.asarray(a), jnp.asarray(b),
                                       block_k=256, interpret=True))
        want = a @ b
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)

    def test_k_reduction_multiblock(self, rng):
        """k spanning several grid blocks accumulates correctly."""
        a = rng.normal(size=(16, 4096)).astype(np.float32)
        b = rng.normal(size=(4096, 8)).astype(np.float32)
        got = np.asarray(K.conv_matmul(jnp.asarray(a), jnp.asarray(b),
                                       block_k=512, interpret=True))
        np.testing.assert_allclose(got, a @ b, rtol=2e-5, atol=1e-3)


class TestMemoryConvTails:
    def test_matches_step_plan(self, rng, key):
        """Pallas tails == PhBath.step_plan's XLA contraction."""
        from sclmd_tpu import baths as B
        nc, ml, nmd, dt = 6, 12, 32, 0.4
        gwl = np.linspace(0, 0.5, 9)
        gam = np.array([np.eye(nc) * 0.1 * np.exp(-w) for w in gwl])
        pb = B.phbath(200.0, range(nc), 0.25, 20, dt, nmd, ml=ml,
                      gamma=gam, gwl=gwl, dtype=jnp.float32)
        old = rng.normal(size=(ml, nc)).astype(np.float32)
        want = np.asarray(pb.step_plan(jnp.asarray(old)))
        got = np.asarray(K.memory_conv_tails(pb.kernel_im[:, 2 * nc:],
                                             jnp.asarray(old), ml, nc,
                                             interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestFusedBathForce:
    def test_matches_reference_formula(self, rng):
        nc, dt = 10, 0.38
        k0 = rng.normal(size=(nc, nc)).astype(np.float32)
        noise = rng.normal(size=nc).astype(np.float32)
        v = rng.normal(size=nc).astype(np.float32)
        tail = rng.normal(size=nc).astype(np.float32)
        got = np.asarray(K.fused_bath_force(
            jnp.asarray(k0), jnp.asarray(noise), jnp.asarray(v),
            jnp.asarray(tail), dt=dt, interpret=True))
        want = noise - dt * (k0 @ v + tail)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
