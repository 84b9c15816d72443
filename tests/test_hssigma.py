"""Tests for the HSSigma real-space self-energy extraction."""

import numpy as np
import pytest

from sclmd_tpu.postprocess import hssigma as HSX
from sclmd_tpu.postprocess.lambda_pipeline import LambdaPipeline, \
    fft_order_grid


def _model(rng, n=5, nk=3, ne=6):
    E = np.linspace(-1.0, 1.0, ne)
    ks = np.linspace(0, np.pi, nk, endpoint=False)
    wk = np.full(nk, 1.0 / nk)
    h0 = rng.normal(size=(n, n)); h0 = (h0 + h0.T) / 2
    t = rng.normal(size=(n, n)) * 0.2
    Hk = np.array([h0 + np.cos(k) * (t + t.T) / 2 for k in ks],
                  dtype=complex)
    Sk = np.broadcast_to(np.eye(n, dtype=complex), (nk, n, n)).copy()
    gl = np.zeros((n, n)); gl[0, 0] = 0.6
    gr = np.zeros((n, n)); gr[-1, -1] = 0.6
    SigLk = np.broadcast_to(-0.5j * gl, (ne, nk, n, n)).astype(complex)
    SigRk = np.broadcast_to(-0.5j * gr, (ne, nk, n, n)).astype(complex)
    return E, ks, wk, Hk, Sk, SigLk, SigRk


class TestExpand:
    def test_pivoted_scatter(self, rng):
        npv, n = 2, 5
        sfe = rng.normal(size=(npv, npv)) + 1j * rng.normal(size=(npv, npv))
        pivot = np.array([3, 1])
        full = HSX.expand_pivoted_sigma(sfe, pivot, n)
        assert full.shape == (n, n)
        np.testing.assert_allclose(full[3, 3], sfe[0, 0])
        np.testing.assert_allclose(full[3, 1], sfe[0, 1])
        np.testing.assert_allclose(full[1, 3], sfe[1, 0])
        assert full[0, 0] == 0

    def test_batched(self, rng):
        sfe = rng.normal(size=(4, 2, 2)).astype(complex)
        full = HSX.expand_pivoted_sigma(sfe, np.array([0, 2]), 3)
        assert full.shape == (4, 3, 3)
        np.testing.assert_allclose(full[2][0, 2], sfe[2][0, 1])


class TestKAverage:
    def test_single_kpoint_roundtrip(self, rng):
        """With one symmetric k-point, back-extraction recovers the
        input self-energies exactly."""
        E, ks, wk, Hk, Sk, SigLk, SigRk = _model(rng, nk=1)
        res = HSX.kaverage_extract(Hk, Sk, SigLk, SigRk, E, wk)
        np.testing.assert_allclose(res["SigmaL"], SigLk[:, 0], atol=1e-8)
        np.testing.assert_allclose(res["SigmaR"], SigRk[:, 0], atol=1e-8)

    def test_transmission_consistency(self, rng):
        E, ks, wk, Hk, Sk, SigLk, SigRk = _model(rng, nk=1)
        res = HSX.kaverage_extract(Hk, Sk, SigLk, SigRk, E, wk)
        # with one k-point, real-space T equals the k-resolved T
        np.testing.assert_allclose(res["T_rs"], res["T_k"][:, 0],
                                   rtol=1e-6, atol=1e-9)
        assert (res["T_k"] > -1e-10).all()

    def test_kaverage_hermitian_structure(self, rng):
        E, ks, wk, Hk, Sk, SigLk, SigRk = _model(rng, nk=3)
        res = HSX.kaverage_extract(Hk, Sk, SigLk, SigRk, E, wk)
        # averaged Sigma retarded: Im part negative semidefinite-ish on
        # the lead orbitals
        gam = 1j * (res["SigmaL"] - np.conjugate(
            np.swapaxes(res["SigmaL"], 1, 2)))
        ev = np.linalg.eigvalsh(gam)
        assert ev.min() > -1e-6

    def test_roundtrip_into_lambda_pipeline(self, rng, tmp_path):
        """hssigma output feeds the Lambda pipeline end-to-end (the
        reference workflow hssigma.py -> lambda.py)."""
        n = 5
        E, ks, wk, Hk, Sk, SigLk, SigRk = _model(rng, n=n, nk=2, ne=8)
        res = HSX.kaverage_extract(Hk, Sk, SigLk, SigRk, E, wk)
        out = str(tmp_path / "HSSigmaMEAN.npz")
        HSX.write_hssigma_mean(out, E, res)
        E2, H, S, S1, S2 = HSX.read_hssigma_mean(out)
        assert len(E2) == len(E) // 2 * 2
        nm = 2
        m = rng.normal(size=(nm, n, n))
        M = np.array([(mi + mi.T) / 2 for mi in m], dtype=complex)
        hw = np.array([0.05, 0.1])
        pl = LambdaPipeline(H, S, E2, S1, S2, M, hw)
        wb = pl.wideband(hwcut=1.0, mu0=0.0)
        assert np.isfinite(wb["eta"]).all()
        np.testing.assert_allclose(wb["eta"], wb["eta"].T, atol=1e-8)
