"""Device-side AMG setup (setup/device_amg.py) vs the host twins.

The device path must reproduce the host (scipy/numpy) setup semantics:
generators, strength, interpolation, and the matrix algebra
(SpGEMM/transpose/truncation) are compared entry-for-entry; PMIS is
checked by its defining properties (the device 32-bit hash is a
different — equally valid — tie-break than the host 53-bit hash).
"""
import numpy as np
import scipy.sparse as sp
import pytest

from hypre_tpu.gen.laplace import laplacian, difconv
from hypre_tpu.setup import device_amg as dev
from hypre_tpu.setup.strength import strength_matrix
from hypre_tpu.setup.interp import direct_interp, truncate_interp
from hypre_tpu.setup.interp_ext import extpi_interp
from hypre_tpu.setup.l1norms import l1_norms
from hypre_tpu.setup.coarsen import C_PT, F_PT


def _rand_csr(n, m, density, seed, ensure_diag=False):
    rng = np.random.default_rng(seed)
    A = sp.random(n, m, density=density, random_state=rng,
                  format="csr", dtype=np.float64)
    if ensure_diag:
        A = (A + sp.eye(n, m, format="csr") * 2.0).tocsr()
    A.sort_indices()
    return A


def test_dell_roundtrip():
    A = _rand_csr(57, 43, 0.1, 0)
    M = dev.dell_from_scipy(A, np.float64)
    B = dev.dell_to_scipy(M)
    assert (abs(A - B)).max() < 1e-14


def test_dell_laplacian_matches_host_generator():
    for shape in ((5, 4, 3), (8, 8, 1), (6, 1, 1)):
        Ah = laplacian(*shape)
        Ad = dev.dell_to_scipy(dev.dell_laplacian(*shape,
                                                  dtype=np.float64))
        assert (abs(Ah - Ad)).max() < 1e-14


def test_device_strength_matches_host():
    for A in (laplacian(6, 5, 4), difconv(5, 5, 5, ax=1.1),
              _rand_csr(60, 60, 0.12, 3, ensure_diag=True)):
        A = A.tocsr()
        M = dev.dell_from_scipy(A, np.float64)
        for theta, mrs in ((0.25, 0.9), (0.5, 1.0)):
            S, _ = strength_matrix(A, theta, mrs, return_mask=True)
            strong = np.asarray(dev.device_strength(M, theta, mrs))
            cols = np.asarray(M.cols)              # slot-major (w, n)
            rows = np.broadcast_to(
                np.arange(M.n_rows)[None, :], cols.shape)
            Sd = sp.csr_matrix(
                (np.ones(strong.sum()),
                 (rows[strong], cols[strong])), shape=A.shape)
            assert (S.astype(bool) != Sd.astype(bool)).nnz == 0


def test_device_pmis_properties():
    A = laplacian(10, 9, 8)
    M = dev.dell_from_scipy(A, np.float64)
    strong = dev.device_strength(M, 0.25, 0.9)
    cf = np.asarray(dev.device_pmis(M.cols, strong))
    strong = np.asarray(strong)
    cols = np.asarray(M.cols)
    assert set(np.unique(cf)) <= {dev.C_PT, dev.F_PT, dev.SF_PT}
    assert (cf == dev.C_PT).sum() > 0
    # every F point strongly depends on at least one C point
    is_c = cf == dev.C_PT
    for i in np.flatnonzero(cf == dev.F_PT):
        nb = cols[:, i][strong[:, i]]
        assert is_c[nb].any(), f"F point {i} has no strong C neighbor"
    # C points form an independent set in the strong graph
    for i in np.flatnonzero(is_c):
        nb = cols[:, i][strong[:, i]]
        assert not is_c[nb].any()


def _host_cf(cf):
    out = np.where(cf == dev.C_PT, C_PT, F_PT)
    return out


def test_device_direct_interp_matches_host():
    A = laplacian(7, 6, 5)
    M = dev.dell_from_scipy(A, np.float64)
    strongd = dev.device_strength(M, 0.25, 0.9)
    cf = np.asarray(dev.device_pmis(M.cols, strongd))
    S, mask = strength_matrix(A, 0.25, 0.9, return_mask=True)
    Ph = direct_interp(A, S, _host_cf(cf), 0.0, 4, strong_mask=mask)
    nc = int((cf == dev.C_PT).sum())
    Pd = dev.dell_to_scipy(dev.device_direct_interp(
        M, strongd, cf, n_coarse=nc, trunc_factor=0.0, max_elmts=4))
    assert Ph.shape == Pd.shape
    assert (abs(Ph - Pd)).max() < 1e-12


def test_device_extpi_interp_matches_host():
    # max_elmts=0: compare the full operator (truncation keeps the
    # max_elmts largest by |value|; equal-magnitude ties are broken in
    # implementation order on both sides, so the truncated operators
    # can legitimately differ at tied entries)
    for A in (laplacian(7, 6, 5), difconv(6, 6, 6, ax=1.3)):
        A = A.tocsr()
        M = dev.dell_from_scipy(A, np.float64)
        strongd = dev.device_strength(M, 0.25, 0.9)
        cf = np.asarray(dev.device_pmis(M.cols, strongd))
        S, mask = strength_matrix(A, 0.25, 0.9, return_mask=True)
        Ph = extpi_interp(A, S, _host_cf(cf), 0.0, 0, strong_mask=mask)
        nc = int((cf == dev.C_PT).sum())
        Pd = dev.dell_to_scipy(dev.device_extpi_interp(
            M, strongd, cf, n_coarse=nc, trunc_factor=0.0,
            max_elmts=0, chunk=64))
        assert Ph.shape == Pd.shape
        assert (abs(Ph - Pd)).max() < 1e-12


def test_device_spgemm_matches_scipy():
    A = _rand_csr(70, 50, 0.15, 1)
    B = _rand_csr(50, 60, 0.15, 2)
    Ad, Bd = dev.dell_from_scipy(A, np.float64), dev.dell_from_scipy(
        B, np.float64)
    w = dev.device_spgemm_width(Ad, Bd, chunk=32)
    C = dev.dell_to_scipy(dev.device_spgemm(Ad, Bd, w, chunk=32))
    assert (abs((A @ B) - C)).max() < 1e-12


def test_device_transpose_matches_scipy():
    A = _rand_csr(40, 70, 0.1, 5)
    Ad = dev.dell_from_scipy(A, np.float64)
    w = dev.device_transpose_width(Ad)
    At = dev.dell_to_scipy(dev.device_transpose(Ad, w))
    assert (abs(A.T - At)).max() < 1e-14


def test_device_truncate_matches_host():
    # distinct magnitudes everywhere (tie-free), so host and device
    # keep identical entry sets
    rng = np.random.default_rng(11)
    P = _rand_csr(80, 30, 0.15, 9)
    P.data = rng.permutation(np.linspace(0.1, 2.0, P.nnz)) \
        * rng.choice([-1.0, 1.0], P.nnz)
    Pd = dev.dell_from_scipy(P, np.float64)
    for tf, me in ((0.2, 0), (0.0, 2), (0.1, 3)):
        Pt_h = truncate_interp(P.copy(), tf, me)
        Pt_d = dev.dell_to_scipy(dev.device_truncate(Pd, tf, me))
        assert (abs(Pt_h - Pt_d)).max() < 1e-12


def test_device_l1_norms_match_host():
    A = difconv(6, 6, 6, ax=1.2).tocsr()
    M = dev.dell_from_scipy(A, np.float64)
    for opt in (1, 4, 5):
        h = l1_norms(A, option=opt)
        d = np.asarray(dev.device_l1_norms(M, option=opt))
        assert np.allclose(h, d, rtol=1e-14)


def test_device_hierarchy_galerkin_consistency():
    """Each device level must satisfy Ac = P^T A P and R = P^T."""
    from hypre_tpu.solvers.amg import AmgConfig

    A = dev.dell_laplacian(10, 9, 8, dtype=np.float64)
    cfg = AmgConfig(interp_type=6, max_coarse_size=20)
    levels = list(dev.iter_device_hierarchy(A, cfg))
    Ac_dev = levels.pop()
    assert len(levels) >= 2
    Al = dev.dell_to_scipy(A)
    for (Adev, Pdev, Rdev, cf) in levels:
        assert (abs(Al - dev.dell_to_scipy(Adev))).max() < 1e-12
        P = dev.dell_to_scipy(Pdev)
        R = dev.dell_to_scipy(Rdev)
        assert (abs(R - P.T)).max() < 1e-12
        Al = (P.T @ (dev.dell_to_scipy(Adev) @ P)).tocsr()
    assert (abs(Al - dev.dell_to_scipy(Ac_dev))).max() < 1e-10


def test_device_hierarchy_drives_convergent_amg():
    """A hierarchy built entirely on device plugs into the solve phase
    and converges at AMG speed (mesh-independent-ish iteration count)."""
    from hypre_tpu.solvers.amg import AmgConfig, BoomerAMG
    from hypre_tpu.solvers.krylov import pcg

    A = laplacian(12, 12, 12)
    cfg = AmgConfig(interp_type=6, relax_type=18)
    amg = BoomerAMG(cfg).setup_device(A)
    b = np.ones(A.shape[0])
    res = pcg(amg.hierarchy.levels[0].A, b, M=amg.hierarchy,
              tol=1e-8, max_iter=60)
    assert float(res.relres) < 1e-8
    assert int(res.iters) <= 30
