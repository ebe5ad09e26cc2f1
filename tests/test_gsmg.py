"""GSMG: smooth-vector strength + LS interpolation."""
import numpy as np

import jax

from hypre_tpu.gen import difconv, laplacian
from hypre_tpu.ops import sparse_op_from_scipy
from hypre_tpu.setup.gsmg import interp_ls, smooth_dirs, smooth_vectors
from hypre_tpu.solvers import AmgConfig, BoomerAMG, pcg


def test_smooth_dirs_tracks_anisotropy():
    # strong y-coupling: smooth vectors vary slowly in y, so strength
    # should prefer y-neighbors
    A = difconv(16, 16, 1, cx=0.01, cy=1.0)
    V = smooth_vectors(A, nsamples=6, sweeps=8)
    S, mask = smooth_dirs(A, V, thresh=1.0)
    Sc = S.tocoo()
    n = 16
    dy = np.abs(Sc.row // n - Sc.col // n)
    frac_y = (dy > 0).sum() / max(len(Sc.row), 1)
    assert frac_y > 0.8, frac_y


def test_ls_interp_reproduces_smooth_vectors():
    from hypre_tpu.setup.coarsen import C_PT, pmis
    A = laplacian(10, 10, 1)
    V = smooth_vectors(A, nsamples=4, sweeps=6)
    S, mask = smooth_dirs(A, V, thresh=0.1)
    cf = pmis(S)
    P = interp_ls(A, V, cf, mask, max_elmts=8)
    is_c = cf == C_PT
    # LS fit: P applied to the smooth vectors' C values approximates
    # the vectors on F points better than injection-by-zero
    err = np.linalg.norm(P @ V[is_c] - V) / np.linalg.norm(V)
    assert err < 0.35, err


def test_gsmg_amg_converges():
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    A = laplacian(14, 14, 14)
    b = np.ones(A.shape[0])
    amg = BoomerAMG(AmgConfig(gsmg=4, num_samples=5,
                              relax_type=18)).setup(A)
    res = pcg(A=sparse_op_from_scipy(A), b=b, M=amg, tol=1e-8,
              max_iter=100)
    assert float(res.relres) <= 1e-8
    assert int(res.iters) <= 40, int(res.iters)
