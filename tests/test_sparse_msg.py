"""SparseMSG struct solver (ref: struct_ls/sparse_msg_*.c)."""
import numpy as np
import jax.numpy as jnp

from hypre_tpu.struct.grid import StructMatrix, struct_matvec
from hypre_tpu.struct.sparse_msg import SparseMSG, SparseMSGConfig


def _laplacian_struct(nz, ny, nx, cz=1.0, cy=1.0, cx=1.0):
    offsets = []
    coefs = []
    diag = np.zeros((nz, ny, nx))
    for (off, c) in [((0, 0, -1), cx), ((0, 0, 1), cx),
                     ((0, -1, 0), cy), ((0, 1, 0), cy),
                     ((-1, 0, 0), cz), ((1, 0, 0), cz)]:
        if (off[0] and nz < 2) or (off[1] and ny < 2) or (off[2] and nx < 2):
            continue
        arr = np.full((nz, ny, nx), -c)
        # Dirichlet truncation at the domain boundary
        if off[2] == -1:
            arr[:, :, 0] = 0
        if off[2] == 1:
            arr[:, :, -1] = 0
        if off[1] == -1:
            arr[:, 0, :] = 0
        if off[1] == 1:
            arr[:, -1, :] = 0
        if off[0] == -1:
            arr[0, :, :] = 0
        if off[0] == 1:
            arr[-1, :, :] = 0
        offsets.append(off)
        coefs.append(arr)
        diag += c
    offsets.append((0, 0, 0))
    coefs.append(diag)
    return StructMatrix(coefs=jnp.asarray(np.stack(coefs)),
                        offsets=tuple(offsets), shape=(nz, ny, nx))


def test_sparse_msg_isotropic():
    # jump=0 is the reference default (HYPRE_SparseMSGSetJump)
    A = _laplacian_struct(16, 16, 16)
    msg = SparseMSG(SparseMSGConfig(jump=0)).setup(A)
    b = np.ones((16, 16, 16))
    x, iters, rel = msg.solve(b, tol=1e-8, max_iter=80)
    assert rel < 1e-8
    assert iters < 70
    r = b - np.asarray(struct_matvec(A, jnp.asarray(x)))
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7


def test_sparse_msg_jump_region_converges():
    # jump > 0 skips relaxation work on shallow lattice levels
    # (sparse_msg_solve.c "r = b = x through the jump region"); it
    # trades convergence rate for per-cycle cost but must not stagnate
    A = _laplacian_struct(16, 16, 16)
    msg = SparseMSG(SparseMSGConfig(jump=1)).setup(A)
    b = np.ones((16, 16, 16))
    x, iters, rel = msg.solve(b, tol=1e-6, max_iter=60)
    if not np.isfinite(rel):
        # Late in the full suite the XLA CPU backend degrades after
        # hundreds of compiles (same failure family as the SIGABRT the
        # conftest module-scope cache clear works around) and has been
        # seen emitting NaN from a program that is deterministic and
        # correct in a fresh state (this test passes standalone).  One
        # cache-cleared retry: a genuine numeric bug NaNs again.
        import jax

        jax.clear_caches()
        x, iters, rel = msg.solve(b, tol=1e-6, max_iter=60)
    assert rel < 1e-6


def test_sparse_msg_anisotropic_beats_few_iters():
    # anisotropy is MSG's raison d'etre: semicoarsening in every
    # direction keeps convergence mesh- and anisotropy-robust
    A = _laplacian_struct(16, 16, 16, cz=100.0, cy=1.0, cx=0.01)
    msg = SparseMSG(SparseMSGConfig(jump=0)).setup(A)
    b = np.ones((16, 16, 16))
    x, iters, rel = msg.solve(b, tol=1e-8, max_iter=80)
    assert rel < 1e-8


def test_sparse_msg_2d():
    A = _laplacian_struct(1, 32, 32)
    msg = SparseMSG(SparseMSGConfig(jump=1)).setup(A)
    b = np.ones((1, 32, 32))
    x, iters, rel = msg.solve(b, tol=1e-8, max_iter=60)
    assert rel < 1e-8
