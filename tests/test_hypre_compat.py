"""HYPRE C-API compat shim (ref: src/HYPRE.h call surface)."""
import numpy as np

from hypre_tpu import hypre_compat as H
from hypre_tpu.gen import laplacian


def test_c_api_amg_pcg_flow():
    A = laplacian(12, 12, 12)
    b = np.ones(A.shape[0])
    solver = H.HYPRE_BoomerAMGCreate()
    H.HYPRE_BoomerAMGSetStrongThreshold(solver, 0.25)
    H.HYPRE_BoomerAMGSetRelaxType(solver, 18)
    H.HYPRE_BoomerAMGSetInterpType(solver, 6)
    H.HYPRE_BoomerAMGSetCoarsenType(solver, 8)     # PMIS
    H.HYPRE_BoomerAMGSetMaxLevels(solver, 20)
    pcg = H.HYPRE_ParCSRPCGCreate()
    H.HYPRE_PCGSetTol(pcg, 1e-8)
    H.HYPRE_PCGSetPrecond(pcg, precond_handle=solver)
    H.HYPRE_ParCSRPCGSetup(pcg, A, b)
    x = H.HYPRE_ParCSRPCGSolve(pcg, A, b)
    it = H.HYPRE_PCGGetNumIterations(pcg)
    r = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert r < 1e-7
    assert 0 < it < 40
    assert H.HYPRE_PCGGetFinalRelativeResidualNorm(pcg) < 1e-7


def test_c_api_standalone_amg_and_gmres():
    A = laplacian(24, 24)
    b = np.ones(A.shape[0])
    s = H.HYPRE_BoomerAMGCreate()
    H.HYPRE_BoomerAMGSetTol(s, 1e-8)
    H.HYPRE_BoomerAMGSetMaxIter(s, 60)
    H.HYPRE_BoomerAMGSetup(s, A)
    x = H.HYPRE_BoomerAMGSolve(s, A, b)
    assert np.linalg.norm(b - A @ x) / np.linalg.norm(b) < 1e-7

    g = H.HYPRE_ParCSRGMRESCreate()
    H.HYPRE_GMRESSetKDim(g, 20)
    H.HYPRE_GMRESSetTol(g, 1e-8)
    H.HYPRE_GMRESSetPrecond(g, precond_handle=s)
    x = H.HYPRE_ParCSRGMRESSolve(g, A, b)
    assert np.linalg.norm(b - A @ x) / np.linalg.norm(b) < 1e-7
    assert H.HYPRE_GMRESGetNumIterations(g) < 30
