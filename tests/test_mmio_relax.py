"""Matrix-market I/O + Kaczmarz/chaotic relaxation + CR coarsening."""
import numpy as np
import scipy.sparse as sp

from hypre_tpu.gen import laplacian
from hypre_tpu.mmio import mm_read, mm_write
from hypre_tpu.solvers import AmgConfig, BoomerAMG, pcg


def test_mm_roundtrip_general(tmp_path):
    A = laplacian(8, 8)
    p = str(tmp_path / "a.mtx")
    mm_write(p, A)
    B = mm_read(p)
    assert (A != B).nnz == 0


def test_mm_roundtrip_symmetric(tmp_path):
    A = laplacian(8, 8)
    p = str(tmp_path / "a.mtx")
    mm_write(p, A, symmetric=True)
    B = mm_read(p)
    assert (A != B).nnz == 0


def test_mm_vector_roundtrip(tmp_path):
    v = np.linspace(0.0, 1.0, 17)
    p = str(tmp_path / "v.mtx")
    mm_write(p, v)
    w = mm_read(p)
    np.testing.assert_allclose(v, w)


def test_mm_pattern(tmp_path):
    p = str(tmp_path / "p.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n")
        f.write("2 2 3\n1 1\n2 2\n1 2\n")
    A = mm_read(p)
    assert A.shape == (2, 2) and A.nnz == 3
    assert A[0, 1] == 1.0


def test_kaczmarz_relax_converges():
    # relax 30 (Kaczmarz, Cimmino form) as an AMG smoother
    A = laplacian(24, 24)
    amg = BoomerAMG(AmgConfig(relax_type=30, num_sweeps=2)).setup(A)
    b = np.ones(A.shape[0])
    res = pcg(A=amg.hierarchy.levels[0].A, b=b, M=amg.hierarchy,
              tol=1e-8, max_iter=80)
    assert float(res.relres) < 1e-8
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7


def test_chaotic_relax_converges():
    # relax 5 (chaotic GS -> two-stage GS analog)
    A = laplacian(24, 24)
    amg = BoomerAMG(AmgConfig(relax_type=5)).setup(A)
    b = np.ones(A.shape[0])
    res = pcg(A=amg.hierarchy.levels[0].A, b=b, M=amg.hierarchy,
              tol=1e-8, max_iter=60)
    assert float(res.relres) < 1e-8


def test_cr_coarsening():
    from hypre_tpu.setup.coarsen import C_PT, cr
    from hypre_tpu.setup.strength import strength_matrix

    A = laplacian(24, 24)
    S = strength_matrix(A, 0.25, 0.9)
    cf = cr(A, S)
    nc = int((cf == C_PT).sum())
    # CR should pick a nontrivial coarse set well below n
    assert 0 < nc < A.shape[0]
    # and AMG built on it should converge
    amg = BoomerAMG(AmgConfig(coarsen_type="cr")).setup(A)
    b = np.ones(A.shape[0])
    res = pcg(A=amg.hierarchy.levels[0].A, b=b, M=amg.hierarchy,
              tol=1e-8, max_iter=100)
    assert float(res.relres) < 1e-8
