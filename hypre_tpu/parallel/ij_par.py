"""Distributed IJ assembly: off-processor stash + device COO assemble.

Analog of hypre's parallel IJ build path:
  * every shard may Set/AddTo values for rows it does NOT own; those
    entries land in an off-proc stash (ref: src/IJ_mv/
    aux_parcsr_matrix.h:50-63 off_proc_i/off_proc_data)
  * assemble() routes stashed entries to their owners (the
    DataExchange step, ref: IJ_mv/IJMatrix_parcsr.c assemble comm) —
    here host-side numpy grouping, the same O(stash) metadata role
  * each owner then reduces its COO stack ON DEVICE with one jitted
    sort + segmented scan (ref: src/IJ_mv/IJMatrix_parcsr_device.c:
    104-130 — the sort+reduce device assemble), honoring hypre's
    duplicate semantics: a later SET overrides everything before it,
    ADDs accumulate on top of the last SET.

The assembled result is a par_setup.ParDEll (global column ids), the
distributed-setup ingestion format — ParBoomerAMG.setup_distributed
consumes it directly.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.parallel.partition import RowPartition

_BIG = np.int64(2 ** 62)


class ParIJMatrix:
    """Per-shard Set/AddTo staging with off-processor routing."""

    def __init__(self, n_global: int, n_shards: int,
                 real_dtype=np.float64):
        self.part = RowPartition.create(n_global, n_shards)
        self.real = np.dtype(real_dtype)
        # one staging list per CALLING shard (rows may be anywhere)
        self._stash = [[] for _ in range(n_shards)]

    def set_values(self, shard: int, rows, cols, values):
        self._push(shard, rows, cols, values, 1)

    def add_to_values(self, shard: int, rows, cols, values):
        self._push(shard, rows, cols, values, 0)

    def _push(self, shard, rows, cols, values, mode):
        rows = np.asarray(rows, np.int64).ravel()
        cols = np.asarray(cols, np.int64).ravel()
        values = np.asarray(values, self.real).ravel()
        self._stash[shard].append(
            (rows, cols, values, np.full(len(rows), mode, np.int8)))

    def assemble(self):
        """Route + device-reduce; returns a ParDEll."""
        from hypre_tpu.parallel.par_setup import ParDEll

        ns = self.part.n_shards
        nl = self.part.n_local
        # ---- route off-proc entries to owners (host metadata step) --
        per_owner = [[] for _ in range(ns)]
        for shard, chunks in enumerate(self._stash):
            if not chunks:
                continue
            rows = np.concatenate([c[0] for c in chunks])
            cols = np.concatenate([c[1] for c in chunks])
            vals = np.concatenate([c[2] for c in chunks])
            mode = np.concatenate([c[3] for c in chunks])
            seq = np.arange(len(rows), dtype=np.int64)
            owner = np.asarray(self.part.owner(rows))
            for q in np.unique(owner):
                sel = owner == q
                per_owner[int(q)].append(
                    (rows[sel], cols[sel], vals[sel], mode[sel],
                     seq[sel], np.full(sel.sum(), shard, np.int64)))

        # ---- stack per owner, pad to a common length ----------------
        parts = []
        for q in range(ns):
            if per_owner[q]:
                r = np.concatenate([t[0] for t in per_owner[q]])
                c = np.concatenate([t[1] for t in per_owner[q]])
                v = np.concatenate([t[2] for t in per_owner[q]])
                m = np.concatenate([t[3] for t in per_owner[q]])
                s = np.concatenate([t[4] for t in per_owner[q]])
                src = np.concatenate([t[5] for t in per_owner[q]])
            else:
                r = np.zeros(0, np.int64)
                c = np.zeros(0, np.int64)
                v = np.zeros(0, self.real)
                m = np.zeros(0, np.int8)
                s = np.zeros(0, np.int64)
                src = np.zeros(0, np.int64)
            parts.append((r, c, v, m, s, src))
        m_max = max((len(p[0]) for p in parts), default=1)
        m_max = max(m_max, 1)

        def pad(a, fill):
            out = np.full((ns, m_max), fill, a[0].dtype
                          if len(a[0]) or True else np.int64)
            for q in range(ns):
                out[q, :len(parts[q][0])] = a[q]
            return out

        rows_s = pad([p[0] for p in parts], _BIG)
        cols_s = pad([p[1] for p in parts], 0)
        vals_s = pad([p[2] for p in parts], 0.0)
        mode_s = pad([p[3] for p in parts], 0).astype(np.int8)
        # deterministic duplicate order: (source shard, sequence) —
        # single-shard streams keep call order like the reference
        seq_s = pad([(p[5] << np.int64(40)) + p[4] for p in parts],
                    np.int64(0))

        # ---- device assemble: sort + segmented set/add scan ---------
        oc, ov, width = _device_assemble(
            jnp.asarray(rows_s), jnp.asarray(cols_s),
            jnp.asarray(vals_s.astype(self.real)),
            jnp.asarray(mode_s.astype(np.int32)),
            jnp.asarray(seq_s),
            starts=jnp.asarray(
                np.minimum(np.asarray(self.part.shard_starts()),
                           self.part.n_global)),
            n_local=nl)
        return ParDEll(cols=oc, vals=ov, row_part=self.part,
                       col_part=self.part)


def _device_assemble(rows, cols, vals, mode, seq, *, starts, n_local):
    """One jitted per-shard COO reduce (IJMatrix_parcsr_device.c
    semantics): sort by (row, col, seq); within each (row, col) run a
    segmented scan makes ADDs accumulate onto the LAST SET."""
    ns, m = rows.shape
    w = int(_assemble_width(rows, cols, starts, n_local))
    w = max(w, 1)
    oc, ov = _assemble_jit(rows, cols, vals, mode, seq, starts,
                           n_local=n_local, w=w)
    return oc, ov, w


@partial(jax.jit, static_argnames=("n_local",))
def _assemble_width(rows, cols, starts, n_local):
    """Max distinct (row, col) pairs of any owned row."""
    ns, m = rows.shape
    valid = rows < _BIG
    key = jnp.where(valid, rows * (jnp.int64(1) << 31) | cols, _BIG)
    ks = jnp.sort(key, axis=1)
    prev = jnp.concatenate(
        [jnp.full((ns, 1), -1, ks.dtype), ks[:, :-1]], axis=1)
    uniq = (ks < _BIG) & (ks != prev)
    loc = ((ks >> 31) - starts[:-1][:, None]).astype(jnp.int32)
    sidx = jnp.broadcast_to(jnp.arange(ns)[:, None], ks.shape)
    ok = uniq & (loc >= 0) & (loc < n_local)
    cnt = jnp.zeros((ns * n_local + 1,), jnp.int32).at[
        jnp.where(ok, sidx * n_local + loc, ns * n_local)].add(
            1, mode="drop")
    return jnp.max(cnt[:-1])


@partial(jax.jit, static_argnames=("n_local", "w"))
def _assemble_jit(rows, cols, vals, mode, seq, starts, *, n_local, w):
    ns, m = rows.shape
    valid = rows < _BIG
    key = jnp.where(valid, rows * (jnp.int64(1) << 31) | cols, _BIG)
    key_s, seq_s, v_s, m_s = jax.lax.sort(
        (key, seq, vals, mode), dimension=1, num_keys=2)
    valid_s = key_s < _BIG
    new = valid_s & jnp.concatenate(
        [jnp.ones((ns, 1), bool), key_s[:, 1:] != key_s[:, :-1]],
        axis=1)
    last = valid_s & jnp.concatenate(
        [key_s[:, :-1] != key_s[:, 1:], jnp.ones((ns, 1), bool)],
        axis=1)

    # segmented set/add scan: value = last SET + trailing ADDs
    def op(a, b):
        a_set, a_val = a
        b_set, b_val = b
        return a_set | b_set, b_val + jnp.where(b_set, 0.0, a_val)

    # run start acts as a barrier: a run beginning with ADD restarts
    # from that entry (add-to-zero semantics)
    is_set = (m_s == 1) | new
    _, total = jax.lax.associative_scan(op, (is_set, v_s), axis=1)

    # compact each row's final values into (w, n_local) slot-major
    run_id = jnp.cumsum(new.astype(jnp.int32), axis=1) - 1
    rows_out = (key_s >> 31).astype(jnp.int64)
    cols_out = (key_s & ((jnp.int64(1) << 31) - 1)).astype(jnp.int32)
    loc = (rows_out - starts[:-1][:, None]).astype(jnp.int32)
    # slot rank within the row = run rank - first run rank of the row
    row_first = jnp.where(
        new & jnp.concatenate(
            [jnp.ones((ns, 1), bool),
             rows_out[:, 1:] != rows_out[:, :-1]], axis=1),
        run_id, 0)
    row_first = jax.lax.associative_scan(jnp.maximum, row_first,
                                         axis=1)
    slot = run_id - row_first
    sidx = jnp.broadcast_to(jnp.arange(ns)[:, None], key_s.shape)
    flat = jnp.where(last & (slot < w) & (loc >= 0) & (loc < n_local),
                     (sidx * w + slot) * n_local + loc,
                     ns * w * n_local)
    oc = jnp.full((ns * w * n_local + 1,), -1, jnp.int32).at[
        flat].set(cols_out, mode="drop")[:-1].reshape(ns, w, n_local)
    ov = jnp.zeros((ns * w * n_local + 1,), vals.dtype).at[
        flat].set(total, mode="drop")[:-1].reshape(ns, w, n_local)
    return oc, ov


class ParIJVector:
    def __init__(self, n_global: int, n_shards: int,
                 real_dtype=np.float64):
        self.part = RowPartition.create(n_global, n_shards)
        self.real = np.dtype(real_dtype)
        self._stash = [[] for _ in range(n_shards)]

    def set_values(self, shard: int, indices, values):
        self._stash[shard].append(
            (np.asarray(indices, np.int64),
             np.asarray(values, self.real), True))

    def add_to_values(self, shard: int, indices, values):
        self._stash[shard].append(
            (np.asarray(indices, np.int64),
             np.asarray(values, self.real), False))

    def assemble(self) -> np.ndarray:
        """Sharded (ns, n_local) vector; sets override, adds sum."""
        out = np.zeros((self.part.n_shards, self.part.n_local),
                       self.real)
        setmask = np.zeros_like(out, dtype=bool)
        chunks = []
        for shard, lst in enumerate(self._stash):
            for idx, v, is_set in lst:
                chunks.append((idx, v, is_set))
        for idx, v, is_set in chunks:
            p = np.asarray(self.part.owner(idx))
            loc = idx - p * self.part.n_local
            if is_set:
                out[p, loc] = v
                setmask[p, loc] = True
            else:
                np.add.at(out, (p, loc), v)
        return out
