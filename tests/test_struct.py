"""Structured-grid layer tests: stencil matvec, RAP, PFMG convergence.

Golden expectations follow the reference struct baselines: CG+PFMG on
256^3 converges in 10 iterations to 2.9e-7 (BASELINE.md struct out.7);
small grids here should behave comparably or better.
"""
import numpy as np

from hypre_tpu.gen import laplacian
from hypre_tpu.struct.grid import (
    StructMatrix, host_coefs, stencil_multiply, struct_laplacian,
    struct_matvec,
)
from hypre_tpu.struct.pfmg import PFMG, PfmgConfig


def test_struct_matvec_matches_csr():
    nz = ny = nx = 8
    As = struct_laplacian(nz, ny, nx)
    Ac = laplacian(nx, ny, nz)  # x-fastest == (z,y,x) C-order match
    u = np.random.RandomState(0).randn(nz, ny, nx)
    y_struct = np.asarray(struct_matvec(As, u))
    y_csr = (Ac @ u.ravel()).reshape(nz, ny, nx)
    np.testing.assert_allclose(y_struct, y_csr, rtol=1e-12)


def test_stencil_multiply_identity():
    A = struct_laplacian(6, 6, 6)
    Ad = host_coefs(A)
    eye = {(0, 0, 0): np.ones((6, 6, 6))}
    prod = stencil_multiply(Ad, eye, (6, 6, 6))
    for off, c in Ad.items():
        np.testing.assert_allclose(prod[off], np.asarray(c))


def test_pfmg_solve_3d():
    A = struct_laplacian(16, 16, 16)
    b = np.ones((16, 16, 16))
    pf = PFMG(PfmgConfig()).setup(A)
    x, it, rel = pf.solve(b, tol=1e-7, max_iter=60)
    assert float(rel) < 1e-7
    r = b - np.asarray(struct_matvec(A, x))
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6
    assert int(it) <= 30, f"PFMG took {int(it)} cycles"  # wJacobi default;
    # RBGS (relax_type 2) does it in ~10


def test_pfmg_anisotropic():
    # strong coupling in z: PFMG must pick cdir 0 first
    A = struct_laplacian(16, 16, 16, cz=100.0, cy=1.0, cx=1.0)
    pf = PFMG(PfmgConfig()).setup(A)
    assert pf.hierarchy.levels[0].cdir == 0
    b = np.ones((16, 16, 16))
    x, it, rel = pf.solve(b, tol=1e-7, max_iter=60)
    assert float(rel) < 1e-7
    assert int(it) <= 30


def test_pfmg_2d():
    A = struct_laplacian(1, 32, 32)
    b = np.ones((1, 32, 32))
    pf = PFMG(PfmgConfig()).setup(A)
    x, it, rel = pf.solve(b, tol=1e-7, max_iter=60)
    assert float(rel) < 1e-7
    assert int(it) <= 20


def test_pfmg_pcg():
    # CG + PFMG (struct benchmark solver 11 analog)
    from hypre_tpu.solvers.krylov import pcg

    A = struct_laplacian(12, 12, 12)
    b = np.ones((12, 12, 12))
    pf = PFMG(PfmgConfig()).setup(A)

    res = pcg(A=lambda u: struct_matvec(A, u), b=b, M=pf.precondition,
              tol=1e-7, max_iter=50)
    r = b - np.asarray(struct_matvec(A, res.x))
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6
    assert int(res.iters) <= 13, f"CG+PFMG took {int(res.iters)}"  # ref: 10 at 256^3


def test_tridiag_cyclic_reduction():
    import scipy.sparse as sp

    from hypre_tpu.ops.tridiag import tridiag_solve

    rng = np.random.RandomState(0)
    n = 37
    a, c = rng.randn(4, n), rng.randn(4, n)
    bb = rng.randn(4, n) + 6.0
    d = rng.randn(4, n)
    x = np.asarray(tridiag_solve(a, bb, c, d))
    for k in range(4):
        T = sp.diags([a[k, 1:], bb[k], c[k, :-1]], [-1, 0, 1]).tocsc()
        np.testing.assert_allclose(x[k], sp.linalg.spsolve(T, d[k]),
                                   rtol=1e-10)


def test_smg_2d():
    from hypre_tpu.struct.smg import SMG, SmgConfig

    A = struct_laplacian(1, 32, 32)
    smg = SMG(SmgConfig()).setup(A)
    b = np.ones((1, 32, 32))
    x, it, rel = smg.solve(b, tol=1e-8, max_iter=50)
    r = b - np.asarray(struct_matvec(A, x))
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7
    assert int(it) <= 12


def test_smg_anisotropic_lines():
    # strong x-coupling: line solves in x make SMG immune
    from hypre_tpu.struct.smg import SMG, SmgConfig

    A = struct_laplacian(1, 32, 32, cx=1000.0, cy=1.0)
    smg = SMG(SmgConfig()).setup(A)
    b = np.ones((1, 32, 32))
    x, it, rel = smg.solve(b, tol=1e-8, max_iter=50)
    assert int(it) <= 8


def test_smg_3d_plane_smoothing():
    from hypre_tpu.struct.smg import SMG, SmgConfig

    A = struct_laplacian(16, 16, 16)
    smg = SMG(SmgConfig()).setup(A)
    b = np.ones((16, 16, 16))
    x, it, rel = smg.solve(b, tol=1e-7, max_iter=50)
    r = b - np.asarray(struct_matvec(A, x))
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6
    # reference: CG+SMG at 128^3 takes 5 iters (BASELINE struct out.3);
    # standalone cycles are a bit more
    assert int(it) <= 10
