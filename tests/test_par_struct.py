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
    # Count + volume bounds (round-4 verdict: presence alone would let
    # middle levels regress to all-gathers).  (a) NO level of the
    # hierarchy may be all-gathered: every all-gather operand must be
    # smaller than the coarsest non-replicated level's shard
    # (coarse-solve replication of tiny grids is the only legal use).
    import re

    def _max_elems(line):
        best = 1
        for dims in re.findall(r"\[([0-9,]+)\]", line):
            n = 1
            for d in dims.split(","):
                n *= int(d)
            best = max(best, n)
        return best

    for line in txt.splitlines():
        s = line.strip()
        if re.match(r"%?\S*all-gather\S* = ", s):
            # measure the all-gather's RESULT type (before operands)
            assert _max_elems(s.split(" all-gather")[0]) <= 128, \
                f"level-sized operand all-gathered: {s[:160]}"
    # (b) halo traffic is bounded: each collective-permute moves one
    # ghost SLAB (<= nx*ny elements = 512 here), and the cycle needs
    # at most 2 permutes (up+down) per stencil application; bound the
    # static count by ops-per-cycle x levels with slack.
    cp_lines = [ln for ln in txt.splitlines()
                if "collective-permute(" in ln
                or "collective-permute-start(" in ln]
    n_levels = len(h.levels) if hasattr(h, "levels") else 8
    assert len(cp_lines) >= 2
    # ~27 static permutes/level measured (relax colors x sweeps x
    # stencil applies x 2 directions); 40/level catches an explosion
    # to per-element or O(levels^2) traffic without churn
    assert len(cp_lines) <= 40 * max(n_levels, 8), \
        f"collective-permute count exploded: {len(cp_lines)}"
    for line in cp_lines:
        assert _max_elems(line) <= 32 * 16 * 16 // 8, \
            f"halo permute moves more than a shard: {line.strip()}"


def test_par_struct_cg_pfmg():
    A = struct_matrix_from_stencil((16, 16, 16), LAP7)
    b = np.ones((16, 16, 16))
    par = ParPFMG(mesh8(), PfmgConfig()).setup(A)
    res = par_struct_pcg(par, b, tol=1e-7, max_iter=60)
    assert float(res.relres) <= 1e-7
    # struct-driver ballpark (BASELINE struct out.7: CG+PFMG 10 iters)
    assert int(res.iters) <= 15
