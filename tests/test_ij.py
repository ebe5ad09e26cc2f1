"""IJ assembly interface tests (ref: TEST_ij/ij_assembly driver which
checks set/add/mixed assembly paths)."""
import numpy as np
import pytest

from hypre_tpu.core.errors import ArgumentError
from hypre_tpu.gen import laplacian
from hypre_tpu.ij import IJMatrix, IJVector


def test_assemble_laplacian_matches_generator():
    n = 6
    ref = laplacian(n, n)
    ij = IJMatrix(0, n * n - 1, 0, n * n - 1)
    coo = ref.tocoo()
    ij.set_values(coo.row, coo.col, coo.data)
    A = ij.assemble()
    assert (A != ref).nnz == 0


def test_add_accumulates_and_set_overrides():
    ij = IJMatrix(0, 3, 0, 3)
    ij.add_to_values([1], [2], [5.0])
    ij.add_to_values([1], [2], [7.0])
    A = ij.assemble()
    assert A[1, 2] == 12.0

    ij.set_values([1], [2], [1.0])   # set after adds wins
    ij.add_to_values([1], [2], [0.5])  # add after set accumulates
    A = ij.assemble()
    assert A[1, 2] == 1.5


def test_fem_style_element_assembly():
    # 1D P1 stiffness assembly: sum of element matrices == laplacian
    n = 10
    ij = IJMatrix(0, n - 1, 0, n - 1)
    for e in range(n - 1):
        ij.add_to_values([e, e, e + 1, e + 1], [e, e + 1, e, e + 1],
                         [1.0, -1.0, -1.0, 1.0])
    # Dirichlet-like ends
    ij.add_to_values([0, n - 1], [0, n - 1], [1.0, 1.0])
    A = ij.assemble()
    ref = laplacian(n)
    assert (A != ref).nnz == 0


def test_out_of_range_raises():
    ij = IJMatrix(0, 3, 0, 3)
    with pytest.raises(ArgumentError):
        ij.set_values([7], [0], [1.0])


def test_matrix_io_roundtrip(tmp_path):
    n = 5
    ref = laplacian(n, n)
    ij = IJMatrix(0, n * n - 1, 0, n * n - 1)
    coo = ref.tocoo()
    ij.set_values(coo.row, coo.col, coo.data)
    p = tmp_path / "A.ij"
    ij.print_to(str(p))
    ij2 = IJMatrix.read_from(str(p))
    assert (ij2.assemble() != ref).nnz == 0


def test_vector_roundtrip(tmp_path):
    v = IJVector(0, 9)
    v.set_values(np.arange(10), np.arange(10) * 1.5)
    v.add_to_values([3], [1.0])
    p = tmp_path / "b.ij"
    v.print_to(str(p))
    v2 = IJVector.read_from(str(p))
    np.testing.assert_allclose(v2.assemble(), v.assemble())


def test_amg_hierarchy_checkpoint(tmp_path):
    from hypre_tpu.core.checkpoint import load_amg, save_amg
    from hypre_tpu.ops import sparse_op_from_scipy
    from hypre_tpu.solvers import AmgConfig, BoomerAMG, pcg

    A = laplacian(20, 20)
    amg = BoomerAMG(AmgConfig(interp_type=6)).setup(A)
    p = tmp_path / "amg.ckpt"
    save_amg(amg, str(p))
    amg2 = load_amg(str(p))
    b = np.ones(A.shape[0])
    r1 = pcg(sparse_op_from_scipy(A), b, M=amg, tol=1e-8, max_iter=100)
    r2 = pcg(sparse_op_from_scipy(A), b, M=amg2, tol=1e-8, max_iter=100)
    assert int(r1.iters) == int(r2.iters)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x))
