"""Distributed IJ assembly: off-proc stash + device COO reduce."""
import numpy as np
import scipy.sparse as sp

import jax

from hypre_tpu.gen.laplace import laplacian
from hypre_tpu.parallel.ij_par import ParIJMatrix, ParIJVector
from hypre_tpu.parallel.par_setup import pardell_to_scipy


def test_offproc_assembly_matches_scipy():
    n = 6 ** 3
    A = laplacian(6, 6, 6).tocoo()
    ij = ParIJMatrix(n, 8)
    # every entry inserted from the WRONG shard (round-robin shifted):
    # all of it lands in the off-proc stash and must route to owners
    for s in range(8):
        sel = (A.row % 8) == s
        ij.add_to_values((s + 3) % 8, A.row[sel], A.col[sel],
                         A.data[sel])
    M = ij.assemble()
    B = pardell_to_scipy(M)
    assert (abs(B - A.tocsr())).max() < 1e-14


def test_set_overrides_add():
    ij = ParIJMatrix(16, 4)
    ij.add_to_values(0, [1], [2], [5.0])
    ij.set_values(1, [1], [2], [7.0])     # later set (higher seq id)
    ij.add_to_values(2, [1], [2], [1.0])  # even later add
    ij.add_to_values(0, [3], [3], [2.0])
    ij.add_to_values(3, [3], [3], [4.0])
    B = pardell_to_scipy(ij.assemble())
    # deterministic (source-shard, sequence) order: shard0 add(5),
    # shard1 set(7), shard2 add(1) -> 8; adds sum -> 6
    assert B[1, 2] == 8.0
    assert B[3, 3] == 6.0


def test_assembled_matrix_drives_distributed_amg():
    from jax.sharding import Mesh
    from hypre_tpu.solvers import AmgConfig
    from hypre_tpu.solvers.par_amg import ParBoomerAMG

    n = 10
    A = laplacian(n, n, n)
    Ac = A.tocoo()
    ij = ParIJMatrix(A.shape[0], 8)
    owner = Ac.row * 8 // A.shape[0]
    for s in range(8):
        sel = owner == s
        ij.add_to_values(s, Ac.row[sel], Ac.col[sel], Ac.data[sel])
    M = ij.assemble()
    mesh = Mesh(np.array(jax.devices()[:8]), ("p",))
    par = ParBoomerAMG(mesh, AmgConfig(interp_type=3, relax_type=18)
                       ).setup_distributed(M)
    b = np.ones(A.shape[0])
    x, it, rel = par.solve(b, method="pcg", tol=1e-8, max_iter=100)
    assert rel <= 1e-8
    assert np.linalg.norm(b - A @ x) / np.linalg.norm(b) < 1e-7


def test_par_ij_vector():
    v = ParIJVector(12, 4)
    v.set_values(0, [5], [3.0])
    v.add_to_values(2, [5], [2.0])
    v.add_to_values(1, [0], [1.5])
    out = v.assemble()
    flat = out.reshape(-1)
    assert flat[5] == 5.0 and flat[0] == 1.5
