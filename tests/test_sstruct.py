"""SStruct layer tests (ref: sstruct object types + Split solver)."""
import numpy as np

from hypre_tpu.ops import sparse_op_from_scipy
from hypre_tpu.solvers import AmgConfig, BoomerAMG, pcg
from hypre_tpu.sstruct import SplitSolver, SStructGrid, SStructMatrix


def two_part_problem(n=8):
    """Two 2D parts glued along an edge with graph entries."""
    grid = SStructGrid()
    stencil = [((0, 0, 0), 4.0), ((0, 0, -1), -1.0), ((0, 0, 1), -1.0),
               ((0, -1, 0), -1.0), ((0, 1, 0), -1.0)]
    grid.add_part((1, n, n), stencil)
    grid.add_part((1, n, n), stencil)
    M = SStructMatrix(grid)
    # glue column x=n-1 of part 0 to column x=0 of part 1
    for y in range(n):
        M.add_graph_entry(0, (0, y, n - 1), 1, (0, y, 0), -1.0)
        M.add_graph_entry(1, (0, y, 0), 0, (0, y, n - 1), -1.0)
    return grid, M


def test_assemble_parcsr_symmetric():
    grid, M = two_part_problem()
    A = M.assemble_parcsr()
    assert A.shape == (grid.n_total, grid.n_total)
    assert abs((A - A.T)).max() < 1e-14


def test_sstruct_amg_solve():
    grid, M = two_part_problem(10)
    A = M.assemble_parcsr()
    b = np.ones(A.shape[0])
    amg = BoomerAMG(AmgConfig(interp_type=6)).setup(A)
    res = pcg(sparse_op_from_scipy(A), b, M=amg, tol=1e-8, max_iter=100)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7


def test_split_solver():
    grid, M = two_part_problem(8)
    A = M.assemble_parcsr()
    b = np.ones(A.shape[0])
    split = SplitSolver(M).setup()
    res = pcg(sparse_op_from_scipy(A), b, M=split.precondition,
              tol=1e-8, max_iter=100)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7
    # split should be an effective preconditioner (few iterations)
    assert int(res.iters) <= 25
