"""btake (Pallas banded gather) + the btake-powered device-setup paths.

Runs the REAL kernel logic through the Pallas interpreter on CPU
(HYPRE_TPU_BTAKE_INTERP) on tiny problems and checks exact agreement
with the XLA-gather device paths — so the TPU-only code is covered by
the CPU suite.  Ref parity anchors: src/seq_mv/csr_spgemm_device.c:15,
src/parcsr_ls/par_lr_interp_device.c:1001, par_coarsen_device.c:30.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hypre_tpu.setup import device_amg as dev
from hypre_tpu.ops import btake as bt


@pytest.fixture
def interp_kernels(monkeypatch):
    monkeypatch.setenv("HYPRE_TPU_BTAKE_INTERP", "1")
    yield


def _rand_dell(n, w, n_cols, seed=0, band=40):
    """Banded random DEll (sorted cols per row, -1 padding)."""
    rng = np.random.default_rng(seed)
    import scipy.sparse as sp

    rows = []
    cols = []
    for i in range(n):
        k = rng.integers(1, w + 1)
        center = min(int(i * n_cols / n), n_cols - 1)
        lo = max(0, center - band)
        hi = min(n_cols, center + band + 1)
        c = rng.choice(np.arange(lo, hi), size=min(k, hi - lo),
                       replace=False)
        cols.extend(c)
        rows.extend([i] * len(c))
    A = sp.csr_matrix(
        (rng.standard_normal(len(rows)), (rows, cols)),
        shape=(n, n_cols))
    return dev.dell_from_scipy(A, np.float64)


def test_btake_matches_take(interp_kernels):
    M = _rand_dell(400, 5, 300, seed=1)
    idx = M.cols
    x = jnp.asarray(np.random.default_rng(2).standard_normal(300))
    plan = bt.btake_plan(idx, 300)
    assert plan is not None
    y = np.asarray(bt.btake(plan, x))
    ref = np.asarray(x)[np.maximum(np.asarray(idx), 0)]
    mask = np.asarray(idx) >= 0
    assert np.array_equal(y[mask], ref[mask])


def test_spgemm_btake_matches_plain(interp_kernels):
    A = _rand_dell(384, 4, 384, seed=3)
    B = _rand_dell(384, 3, 256, seed=4)
    plan = dev.spgemm_plan(A, B.n_rows)
    assert plan is not None
    w = dev.device_spgemm_width(A, B, chunk=128, plan=plan)
    C1 = dev.device_spgemm(A, B, w, chunk=128, plan=plan)
    # plain XLA path
    os.environ["HYPRE_TPU_NO_BTAKE"] = "1"
    try:
        w2 = dev.device_spgemm_width(A, B, chunk=128)
        C2 = dev.device_spgemm(A, B, w2, chunk=128)
    finally:
        del os.environ["HYPRE_TPU_NO_BTAKE"]
    assert w == w2
    s1 = dev.dell_to_scipy(C1)
    s2 = dev.dell_to_scipy(C2)
    assert (abs(s1 - s2).max() if s1.nnz or s2.nnz else 0.0) < 1e-12


def test_transpose_sorted_matches(interp_kernels):
    P = _rand_dell(300, 4, 90, seed=5)
    PT = dev.device_transpose_sorted(P)
    assert PT is not None
    s = dev.dell_to_scipy(P)
    st = dev.dell_to_scipy(PT)
    assert (abs(st - s.T).max() if st.nnz else 0.0) < 1e-12
    # DEll invariant: ascending cols within each row
    c = np.asarray(PT.cols)
    for i in range(c.shape[1]):
        v = c[:, i][c[:, i] >= 0]
        assert np.all(np.diff(v) > 0)


def test_transpose_stencil_matches(interp_kernels):
    A = dev.dell_laplacian(6, 6, 6, dtype=jnp.float64)
    strong = dev.device_strength(A, 0.25, 0.9)
    cf = dev.device_pmis(A, strong)
    n_c = int(jnp.sum(cf == dev.C_PT))
    P = dev.device_extpi_interp(A, strong, cf, n_coarse=n_c)
    PT = dev.device_transpose_stencil(P, A.disp, cf)
    assert PT is not None
    s = dev.dell_to_scipy(P)
    st = dev.dell_to_scipy(PT)
    assert (abs(st - s.T).max() if st.nnz else 0.0) < 1e-12


def test_device_hierarchy_btake_matches_plain(interp_kernels):
    """Full device hierarchy (PMIS + ext+i + RAP) with btake kernels
    == the plain XLA-gather hierarchy, level by level, bitwise."""
    from hypre_tpu.solvers.amg import AmgConfig

    A0 = _rand_dell(500, 5, 500, seed=7)
    # symmetrize so PMIS/interp see a plausible operator
    import scipy.sparse as sp

    s = dev.dell_to_scipy(A0)
    s = s + s.T + 10.0 * sp.eye(500)
    A = dev.dell_from_scipy(s.tocsr(), np.float64)
    cfg = AmgConfig(interp_type=6, max_levels=3, max_coarse_size=40)

    levels_b = [item for item in dev.iter_device_hierarchy(A, cfg)]
    os.environ["HYPRE_TPU_NO_BTAKE"] = "1"
    try:
        levels_p = [item for item in dev.iter_device_hierarchy(A, cfg)]
    finally:
        del os.environ["HYPRE_TPU_NO_BTAKE"]
    assert len(levels_b) == len(levels_p)
    for lb, lp in zip(levels_b, levels_p):
        if isinstance(lb, tuple):
            for mb, mp in zip(lb[:3], lp[:3]):
                db = dev.dell_to_scipy(mb)
                dp = dev.dell_to_scipy(mp)
                assert (abs(db - dp).max()
                        if db.nnz or dp.nnz else 0.0) < 1e-12
            assert np.array_equal(np.asarray(lb[3]), np.asarray(lp[3]))
        else:
            db = dev.dell_to_scipy(lb)
            dp = dev.dell_to_scipy(lp)
            assert (abs(db - dp).max()
                    if db.nnz or dp.nnz else 0.0) < 1e-12


def test_gstell_pack_place(interp_kernels):
    """Device GST-ELL pack (merge placement, no scatter) matvec
    matches scipy."""
    from hypre_tpu.ops.gstell_device import gstell_from_dell
    from hypre_tpu.ops.gstell import gstell_matvec_reference

    M = _rand_dell(600, 6, 600, seed=9)
    G = gstell_from_dell(M, np.float64)
    assert G is not None
    x = np.random.default_rng(10).standard_normal(600)
    y = np.asarray(gstell_matvec_reference(G, jnp.asarray(x)))
    ref = dev.dell_to_scipy(M) @ x
    np.testing.assert_allclose(y, ref, rtol=1e-10, atol=1e-10)
