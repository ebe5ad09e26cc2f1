"""Mesh-sharded struct layer: distributed PFMG on the 8-device mesh.

Asserts (a) iteration/residual parity with the single-chip PFMG,
(b) the compiled SPMD program moves halos with collective-permute
(the compiler-written CommPkg) rather than gathering the grid."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding

from hypre_tpu.struct.grid import struct_matrix_from_stencil
from hypre_tpu.struct.par_struct import ParPFMG, par_struct_pcg
from hypre_tpu.struct.pfmg import PFMG, PfmgConfig

LAP7 = [((0, 0, 0), 6.0), ((0, 0, -1), -1.0), ((0, 0, 1), -1.0),
        ((0, -1, 0), -1.0), ((0, 1, 0), -1.0),
        ((-1, 0, 0), -1.0), ((1, 0, 0), -1.0)]


def mesh8():
    return Mesh(np.array(jax.devices()[:8]), ("p",))


def test_par_pfmg_matches_single_chip():
    A = struct_matrix_from_stencil((32, 16, 16), LAP7)
    b = np.ones((32, 16, 16))
    ref = PFMG(PfmgConfig(tol=1e-7, max_iter=60)).setup(A)
    x1, it1, rel1 = ref.solve(b)
    par = ParPFMG(mesh8(), PfmgConfig(tol=1e-7, max_iter=60)).setup(A)
    x2, it2, rel2 = par.solve(b)
    assert int(it1) == int(it2)
    assert abs(float(rel1) - float(rel2)) < 1e-9
    assert np.allclose(np.asarray(x1), np.asarray(x2), atol=1e-8)


def test_par_pfmg_halo_is_collective_permute():
    A = struct_matrix_from_stencil((32, 16, 16), LAP7)
    par = ParPFMG(mesh8(), PfmgConfig()).setup(A)
    h = par.inner.hierarchy
    cyc = par.cycle_fn()
    b = jax.device_put(
        jnp.ones((32, 16, 16)),
        NamedSharding(par.mesh, par.level_specs[0]))
    txt = jax.jit(cyc).lower(h, b).compile().as_text()
    assert "collective-permute" in txt, \
        "halo exchange should compile to collective-permute"
    # the fine grid must never be all-gathered: no all-gather touching
    # a full-grid-sized operand (32*16*16 elements)
    for line in txt.splitlines():
        if "all-gather" in line and "8192" in line:
            raise AssertionError(f"fine grid all-gathered: {line}")


def test_par_struct_cg_pfmg():
    A = struct_matrix_from_stencil((16, 16, 16), LAP7)
    b = np.ones((16, 16, 16))
    par = ParPFMG(mesh8(), PfmgConfig()).setup(A)
    res = par_struct_pcg(par, b, tol=1e-7, max_iter=60)
    assert float(res.relres) <= 1e-7
    # struct-driver ballpark (BASELINE struct out.7: CG+PFMG 10 iters)
    assert int(res.iters) <= 15
