"""ILU preconditioner family.

Analog of hypre's ILU solver (ref: src/parcsr_ls/par_ilu_setup.c:15;
type enum HYPRE_parcsr_ls.h:4780-4791):

  ilu_type  0 / 1   block-Jacobi ILU(k) / ILUT
           10 / 11  GMRES-ILU(k) / GMRES-ILUT (inner Krylov wrapped
                    around the factored apply — a flexible precond)
           20 / 21  NSH: Newton–Schulz–Hotelling sparse approximate
                    inverse built on top of ILU dropping rules
                    (ref: par_ilu_setup.c hypre_ILUSetupNSH)
           30 / 31  RAS: restricted additive Schwarz with per-block
                    ILU subdomain solves (ref: hypre_ILUSetupRAPILU /
                    the Schwarz overlap semantics of par_ilu.c)
           50       iterative ILU0: Chow–Patel fixed-point setup +
                    truncated-Jacobi triangular solves (the GPU path
                    hypre added for devices without good trisolves)

TPU-native design: factorization runs in native C++ at setup
(csrc/setup_kernels.cpp ilu_factor — row-wise IKJ with level-of-fill
or dual-threshold dropping, the true sequential data dependence), and
the APPLY is what compiles to the chip: exact triangular solves as
wavefront-scheduled level sweeps (ops/trisolve.py — each wavefront is
one vectorized gather+FMA) or truncated Jacobi (a few SpMVs).  RAS
subdomain solves share one block-diagonal wavefront structure, so all
blocks advance in lockstep — the batched analog of per-rank ILU.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@dataclasses.dataclass
class IluConfig:
    ilu_type: int = 0          # hypre enum (see module docstring)
    fill_level: int = 0        # k in ILU(k)   (HYPRE_ILUSetLevelOfFill)
    drop_tol: float = 1e-2     # ILUT          (HYPRE_ILUSetDropThreshold)
    max_row_nnz: int = 1000    # ILUT keep cap (HYPRE_ILUSetMaxNnzPerRow)
    tri_solve: str = "exact"   # "exact" wavefront | "jacobi" truncated
    tri_iters: int = 5         # Jacobi iterations per triangular solve
    sweeps: int = 5            # Chow–Patel fixed-point sweeps (type 50)
    inner_iters: int = 5       # GMRES-ILU inner iterations (types 10/11)
    ras_block_size: int = 512  # RAS subdomain rows   (types 30/31)
    ras_overlap: int = 32      # RAS overlap per side
    nsh_iters: int = 2         # Newton–Schulz–Hotelling iterations
    nsh_drop_tol: float = 1e-3


class ILU:
    """{Create, Setup(A), precondition(r)} — usable directly as the M
    of any Krylov template (the HYPRE_ILUSetup/Solve surface)."""

    def __init__(self, config: IluConfig | None = None):
        self.config = config or IluConfig()
        self.L = None           # SparseOp strict lower (unit diagonal)
        self.U = None           # SparseOp strict upper
        self.udiag_inv = None
        self._wf_lo = None      # WavefrontTriSolve (exact mode)
        self._wf_up = None
        self._nsh_op = None     # approximate-inverse SparseOp (20/21)
        self._ras = None        # (ext_idx, own_pos, own_rows) (30/31)
        self._A_op = None       # fine operator (GMRES-ILU inner solve)

    # -- setup ---------------------------------------------------------

    def setup(self, A: sp.csr_matrix) -> "ILU":
        cfg = self.config
        t = cfg.ilu_type
        A = A.tocsr()
        A.sort_indices()
        if t == 50:
            return self._setup_chow_patel(A)
        if t in (30, 31):
            return self._setup_ras(A, is_ilut=(t % 10 == 1))
        self._setup_factor(A, is_ilut=(t % 10 == 1))
        if t in (20, 21):
            self._setup_nsh(A)
        if t in (10, 11):
            from hypre_tpu.ops.formats import sparse_op_from_scipy

            self._A_op = sparse_op_from_scipy(A, prefer_dia=False)
        return self

    def _factor(self, A, is_ilut):
        cfg = self.config
        from hypre_tpu.setup.utils import native_enabled

        if native_enabled():
            from hypre_tpu.csrc import build as native

            return native.ilu_factor(
                A, fill_k=cfg.fill_level, drop_tol=cfg.drop_tol,
                max_keep=cfg.max_row_nnz, is_ilut=is_ilut)
        return _ilu_factor_numpy(A, cfg.fill_level, cfg.drop_tol,
                                 cfg.max_row_nnz, is_ilut)

    def _setup_factor(self, A, is_ilut):
        from hypre_tpu.core.config import get_config
        from hypre_tpu.ops.formats import sparse_op_from_scipy

        real = get_config().np_real
        cfg = self.config
        Lm, ud, Um = self._factor(A, is_ilut)
        self.L = sparse_op_from_scipy(Lm, prefer_dia=False)
        self.U = sparse_op_from_scipy(Um, prefer_dia=False)
        self.udiag_inv = jnp.asarray((1.0 / ud).astype(real))
        if cfg.tri_solve == "exact":
            from hypre_tpu.ops.trisolve import build_trisolve

            n = A.shape[0]
            self._wf_lo = build_trisolve(Lm, np.ones(n), backward=False,
                                         real_dtype=real)
            self._wf_up = build_trisolve(Um, ud, backward=True,
                                         real_dtype=real)
        self._LU_scipy = (Lm, ud, Um)
        return self

    def _setup_nsh(self, A):
        """Newton–Schulz–Hotelling approximate inverse: M0 = Aᵀ scaled
        by 1/(‖A‖₁‖A‖∞) (the Pan–Reif init, convergent for any A),
        then M ← M(2I − AM) with ILU-style magnitude dropping per
        iteration (ref: par_ilu_setup.c hypre_ILUSetupNSH /
        hypre_NSHSetup)."""
        from hypre_tpu.ops.formats import sparse_op_from_scipy
        from hypre_tpu.setup.utils import native_enabled

        cfg = self.config
        # init M0 = D^{-1} (the convergent one-step MR stand-in; the
        # reference seeds NSH with an MR approximate inverse)
        d = A.diagonal()
        M = sp.diags(1.0 / np.where(d != 0, d, 1.0)).tocsr()
        eye2 = sp.identity(A.shape[0], format="csr") * 2.0

        def gemm(X, Y):
            if native_enabled():
                from hypre_tpu.csrc import build as native

                return native.spgemm(X.tocsr(), Y.tocsr())
            return (X @ Y).tocsr()

        for _ in range(cfg.nsh_iters):
            AM = gemm(A, M)
            M = gemm(M, (eye2 - AM).tocsr())
            # drop small entries relative to the row max (the ILUT rule)
            M = M.tocsr()
            rmax = np.maximum.reduceat(
                np.abs(M.data), M.indptr[:-1],
            ) if M.nnz else np.zeros(M.shape[0])
            rmax = np.where(np.diff(M.indptr) > 0, rmax, 1.0)
            thresh = np.repeat(rmax * cfg.nsh_drop_tol, np.diff(M.indptr))
            M.data[np.abs(M.data) < thresh] = 0.0
            M.eliminate_zeros()
        self._nsh_op = sparse_op_from_scipy(M, prefer_dia=False)

    def _setup_ras(self, A, is_ilut):
        """Restricted additive Schwarz: contiguous row blocks extended
        by `ras_overlap` on each side; every extended subdomain is
        ILU-factored; the apply solves ALL subdomains in one
        block-diagonal wavefront trisolve and keeps only each block's
        OWNED rows (the 'restricted' in RAS — no overlap double
        counting, no damping needed).  This is exactly hypre's
        rank-local ILU with overlap, with blocks as virtual ranks."""
        from hypre_tpu.core.config import get_config
        from hypre_tpu.ops.formats import sparse_op_from_scipy
        from hypre_tpu.ops.trisolve import build_trisolve

        real = get_config().np_real
        cfg = self.config
        n = A.shape[0]
        bs, ov = cfg.ras_block_size, cfg.ras_overlap
        ext_rows, own_pos, own_rows = [], [], []
        blocks = []
        pos = 0
        for s in range(0, n, bs):
            e = min(s + bs, n)
            lo, hi = max(s - ov, 0), min(e + ov, n)
            rows = np.arange(lo, hi)
            ext_rows.append(rows)
            own_pos.append(np.arange(pos + (s - lo), pos + (s - lo) + (e - s)))
            own_rows.append(np.arange(s, e))
            blocks.append(A[lo:hi, lo:hi].tocsr())
            pos += hi - lo
        Abd = sp.block_diag(blocks, format="csr")
        Lm, ud, Um = self._factor(Abd, is_ilut)
        self.udiag_inv = jnp.asarray((1.0 / ud).astype(real))
        self.L = sparse_op_from_scipy(Lm, prefer_dia=False)
        self.U = sparse_op_from_scipy(Um, prefer_dia=False)
        if cfg.tri_solve == "exact":
            m = Abd.shape[0]
            self._wf_lo = build_trisolve(Lm, np.ones(m), backward=False,
                                         real_dtype=real)
            self._wf_up = build_trisolve(Um, ud, backward=True,
                                         real_dtype=real)
        ext_idx = np.concatenate(ext_rows)
        opos = np.concatenate(own_pos)
        orows = np.concatenate(own_rows)
        # scatter-as-gather: x[orows] = z[opos]; orows is a permutation
        # of range(n), so precompute the inverse gather
        gather = np.empty(n, dtype=np.int64)
        gather[orows] = opos
        self._ras = (jnp.asarray(ext_idx), jnp.asarray(gather))
        return self

    def _setup_chow_patel(self, A):
        """Chow–Patel fixed-point ILU0 (the iterative GPU setup hypre
        type 50 uses; see round-1 module history)."""
        from hypre_tpu.core.config import get_config
        from hypre_tpu.ops.formats import sparse_op_from_scipy

        real = get_config().np_real
        n = A.shape[0]
        coo = A.tocoo()
        rows = coo.row.astype(np.int64)
        cols = coo.col.astype(np.int64)
        vals = coo.data.astype(np.float64)
        nnz = len(vals)

        lower = rows > cols
        f = vals.copy()
        diag_pos = np.flatnonzero(rows == cols)
        diag_of_row = np.full(n, -1, dtype=np.int64)
        diag_of_row[rows[diag_pos]] = diag_pos

        key = rows * n + cols
        key_sorted = np.argsort(key)
        key_s = key[key_sorted]

        def find(i_arr, k_arr):
            kk = i_arr * n + k_arr
            p = np.searchsorted(key_s, kk)
            p = np.minimum(p, nnz - 1)
            hit = key_s[p] == kk
            return np.where(hit, key_sorted[p], -1), hit

        row_start = A.indptr[rows]
        row_cnt = A.indptr[rows + 1] - row_start
        te = np.repeat(np.arange(nnz), row_cnt)
        tpos = (np.arange(len(te))
                - np.repeat(np.cumsum(row_cnt) - row_cnt, row_cnt)
                + row_start[te])
        tk = A.indices[tpos].astype(np.int64)
        ti, tj = rows[te], cols[te]
        valid = tk < np.minimum(ti, tj)
        te, tk, ti, tj = te[valid], tk[valid], ti[valid], tj[valid]
        ik_pos = tpos[valid]
        kj_pos, hit = find(tk, tj)
        te, ik_pos, kj_pos = te[hit], ik_pos[hit], kj_pos[hit]

        for _ in range(self.config.sweeps):
            prod = np.bincount(te, f[ik_pos] * f[kj_pos], minlength=nnz)
            new = vals - prod
            udiag = f[diag_of_row[cols]]
            udiag = np.where(udiag != 0, udiag, 1.0)
            f = np.where(lower, new / udiag, new)

        Lm = sp.coo_matrix((f[lower], (rows[lower], cols[lower])),
                           shape=A.shape).tocsr()
        Um = sp.coo_matrix((f[~lower], (rows[~lower], cols[~lower])),
                           shape=A.shape).tocsr()
        ud = f[diag_of_row[np.arange(n)]]
        ud = np.where(ud != 0, ud, 1.0)
        self.L = sparse_op_from_scipy(Lm, prefer_dia=False)
        self.U = sparse_op_from_scipy(sp.triu(Um, k=1).tocsr(),
                                      prefer_dia=False)
        self.udiag_inv = jnp.asarray((1.0 / ud).astype(real))
        self._LU_scipy = (Lm, Um)
        return self

    # -- apply ---------------------------------------------------------

    def _trisolves(self, r):
        """x = U^{-1} L^{-1} r."""
        from hypre_tpu.ops.formats import matvec

        if self._wf_lo is not None:
            return self._wf_up.solve(self._wf_lo.solve(r))
        k = self.config.tri_iters
        y = r
        for _ in range(k):
            y = r - matvec(self.L, y)
        x = self.udiag_inv * y
        for _ in range(k):
            x = self.udiag_inv * (y - matvec(self.U, x))
        return x

    def precondition(self, r):
        t = self.config.ilu_type
        if t in (20, 21):
            from hypre_tpu.ops.formats import matvec

            return matvec(self._nsh_op, r)
        if t in (30, 31):
            ext_idx, gather = self._ras
            rw = jnp.take(r, ext_idx, axis=0)
            z = self._trisolves(rw)
            return jnp.take(z, gather, axis=0)
        if t in (10, 11):
            # inner GMRES wrapped around the factored apply; used as a
            # (flexible) preconditioner, ref ilu_type 10/11 semantics
            from hypre_tpu.solvers.krylov_more import gmres

            res = gmres(self._A_op, r, M=self._trisolves, tol=0.0,
                        max_iter=self.config.inner_iters,
                        k_dim=self.config.inner_iters)
            return res.x
        return self._trisolves(r)


def _ilu_factor_numpy(A, fill_k, drop_tol, max_keep, is_ilut):
    """Pure-python twin of the native ilu_factor (slow; tests only)."""
    n = A.shape[0]
    lrows, urows = [], []
    udiag = np.zeros(n)
    upat = []          # per previous row: (cols ndarray, vals, levs)
    for i in range(n):
        w = {}
        lev = {}
        b, e = A.indptr[i], A.indptr[i + 1]
        rsum = 0.0
        for p in range(b, e):
            w[int(A.indices[p])] = float(A.data[p])
            lev[int(A.indices[p])] = 0
            rsum += abs(float(A.data[p]))
        tau = drop_tol * rsum / max(e - b, 1) if is_ilut else 0.0
        w.setdefault(i, 0.0)
        lev.setdefault(i, 0)
        import heapq

        heap = [j for j in w if j < i]
        heapq.heapify(heap)
        done = set()
        lpart = []
        while heap:
            k = heapq.heappop(heap)
            if k in done:
                continue
            done.add(k)
            lik = w[k] / udiag[k]
            if is_ilut and abs(lik) < tau:
                del w[k]
                continue
            w[k] = lik
            lpart.append(k)
            cols, vals, levs = upat[k]
            for j, v, lv in zip(cols, vals, levs):
                fl = 0 if is_ilut else lev[k] + lv + 1
                if j not in w:
                    if not is_ilut and fl > fill_k:
                        continue
                    w[j] = -lik * v
                    lev[j] = fl
                    if j < i:
                        heapq.heappush(heap, int(j))
                else:
                    w[j] -= lik * v
                    if not is_ilut:
                        lev[j] = min(lev[j], fl)
        upart = sorted(j for j in w if j > i)
        if is_ilut:
            lpart = sorted([j for j in lpart if abs(w[j]) >= tau],
                           key=lambda j: -abs(w[j]))[:max_keep]
            lpart.sort()
            upart = sorted([j for j in upart if abs(w[j]) >= tau],
                           key=lambda j: -abs(w[j]))[:max_keep]
            upart.sort()
        di = w.get(i, 0.0)
        if di == 0.0:
            di = 1e-12 * rsum if rsum > 0 else 1.0
        udiag[i] = di
        lrows.append([(j, w[j]) for j in lpart])
        urows.append([(j, w[j]) for j in upart])
        upat.append((np.array(upart, dtype=np.int64),
                     np.array([w[j] for j in upart]),
                     np.array([0 if is_ilut else lev[j]
                               for j in upart], dtype=np.int64)))
    def to_csr(rows_list):
        indptr = np.zeros(n + 1, dtype=np.int64)
        ind, dat = [], []
        for i, row in enumerate(rows_list):
            for j, v in row:
                ind.append(j)
                dat.append(v)
            indptr[i + 1] = len(ind)
        return sp.csr_matrix((np.array(dat), np.array(ind, dtype=np.int32),
                              indptr), shape=(n, n))
    return to_csr(lrows), udiag, to_csr(urows)


def ilu_refactor(A, L, U):
    """Parallel (level-scheduled, OpenMP) numeric factorization on a
    fixed pattern — the Euclid parallel-elimination design point
    (ref: src/distributed_ls/Euclid/Euclid_dh.c:127) and the setup-
    reuse path (keep symbolic pattern, refresh values for a new A).
    Exact ILU(0) when L/U are tril/triu(A); static-pattern ILU
    otherwise.  Returns (L', udiag', U') scipy CSR + array."""
    from hypre_tpu.csrc import build as native

    return native.ilu_refactor(A, L, U)
