"""Halo-exchange communication package for sharded vectors.

TPU-native re-design of hypre's CommPkg/CommHandle machinery
(ref: src/parcsr_mv/par_csr_communication.h:52-78 send_map_elmts /
recv_vec_starts; nonblocking exchange par_csr_communication.c:358,
492-546).  Instead of per-neighbor MPI Isend/Irecv, the exchange is a
static schedule of `lax.ppermute` rounds over the mesh axis:

* At setup (host, numpy) the set of distinct shard-offset deltas
  {owner(ghost) - me} is collected over ALL shards; each delta becomes
  one ppermute round riding the ICI.  For box-partitioned stencil
  problems this is a handful of uniform offsets (the shard-grid
  neighbors), exactly like hypre's num_sends neighbor list.
* Per round r, shard p packs x[send_idx[p, r, :]] (padded with a mask)
  and ppermutes it to shard p + offset[r]; the receiver scatters the
  buffer into its ghost slots via recv_idx.  Pack/unpack mirror
  send_map_elmts / the contiguous recv ranges of the reference.
* Everything is static-shape: send_idx/recv_idx are (n_shards, R, S)
  arrays sharded on axis 0, so inside shard_map each shard sees its
  own slice — same program, per-shard data, true SPMD.

The rendezvous machinery hypre needs to discover communication
partners (assumed partition + DataExchangeList, ref: src/utilities/
ap.c, exchange_data.c:108) disappears: setup runs on host with a
global view and writes the schedule directly.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.tree_util.register_dataclass,
         data_fields=["send_idx", "send_mask", "recv_idx"],
         meta_fields=["offsets", "n_ghost", "axis_name"])
@dataclasses.dataclass(frozen=True)
class CommPkg:
    """Static halo-exchange schedule.

    send_idx:  int32[n_shards, R, S]  local row index to pack (0 pad)
    send_mask: real [n_shards, R, S]  1.0 valid / 0.0 padding
    recv_idx:  int32[n_shards, R, S]  ghost slot to fill; padding
               slots point at index n_ghost (a dump slot)
    offsets:   static tuple[int]      shard delta per round
    n_ghost:   static int             ghost buffer size (max over shards)
    """

    send_idx: jax.Array
    send_mask: jax.Array
    recv_idx: jax.Array
    offsets: tuple
    n_ghost: int
    axis_name: str = "p"


def build_comm_pkg(ghost_gids_per_shard, partition, real_dtype=np.float64,
                   axis_name: str = "p") -> CommPkg:
    """Host-side CommPkg construction (hypre_MatvecCommPkgCreate analog,
    ref: src/parcsr_mv/par_csr_communication.c:1163).

    ghost_gids_per_shard: list (len n_shards) of sorted int arrays of
    global row ids each shard needs (its col_map_offd).
    """
    n_shards = partition.n_shards
    # per (recv_shard, send_shard): which gids travel
    offset_set = set()
    per_pair = {}
    for p in range(n_shards):
        gids = np.asarray(ghost_gids_per_shard[p], dtype=np.int64)
        if gids.size == 0:
            continue
        owners = partition.owner(gids)
        for q in np.unique(owners):
            sel = owners == q
            per_pair[(p, int(q))] = gids[sel]
            offset_set.add(int(q) - p)
    offsets = tuple(sorted(offset_set))
    R = max(len(offsets), 1)

    max_ghost = max((len(g) for g in ghost_gids_per_shard), default=0)
    max_ghost = max(max_ghost, 1)

    # max packed size per round
    s_max = 1
    for (p, q), gids in per_pair.items():
        s_max = max(s_max, len(gids))

    send_idx = np.zeros((n_shards, R, s_max), dtype=np.int32)
    send_mask = np.zeros((n_shards, R, s_max), dtype=np.dtype(real_dtype))
    recv_idx = np.full((n_shards, R, s_max), max_ghost, dtype=np.int32)

    for r, off in enumerate(offsets):
        for p in range(n_shards):  # p receives from q = p + off
            q = p + off
            if not (0 <= q < n_shards):
                continue
            gids = per_pair.get((p, q))
            if gids is None:
                continue
            k = len(gids)
            # sender q packs local indices of gids
            send_idx[q, r, :k] = partition.local_index(gids)
            send_mask[q, r, :k] = 1.0
            # receiver p scatters into its ghost slots
            ghosts = np.asarray(ghost_gids_per_shard[p])
            slots = np.searchsorted(ghosts, gids)
            recv_idx[p, r, :k] = slots

    return CommPkg(
        send_idx=jnp.asarray(send_idx),
        send_mask=jnp.asarray(send_mask),
        recv_idx=jnp.asarray(recv_idx),
        offsets=offsets,
        n_ghost=int(max_ghost),
        axis_name=axis_name,
    )


def exchange(x_loc: jax.Array, cp: CommPkg) -> jax.Array:
    """Fill the ghost buffer for this shard.  Runs inside shard_map;
    x_loc is (n_local,), cp fields carry a leading length-1 shard axis.

    The reference overlaps this with the diag SpMV
    (par_csr_matvec.c:187-210); under XLA the same overlap falls out of
    the latency-hiding scheduler because the diag matvec has no data
    dependence on the ppermute results.
    """
    n_shards = jax.lax.axis_size(cp.axis_name)
    ghost = jnp.zeros((cp.n_ghost + 1,), dtype=x_loc.dtype)
    for r, off in enumerate(cp.offsets):
        # shard q sends to shard q - off (receiver p satisfies q = p + off)
        perm = [(q, q - off) for q in range(n_shards)
                if 0 <= q - off < n_shards]
        # mask cast: integer/bool payloads (gids, cmap, flags) must not
        # promote to float — f32 rounds ids past 2^24
        buf = x_loc[cp.send_idx[0, r]] \
            * cp.send_mask[0, r].astype(x_loc.dtype)
        buf = jax.lax.ppermute(buf, cp.axis_name, perm)
        ghost = ghost.at[cp.recv_idx[0, r]].set(buf, mode="drop")
    return ghost[:-1]


def exchange_mat(X_loc: jax.Array, cp: CommPkg) -> jax.Array:
    """Row-payload halo exchange: X_loc (n_local, F) -> ghost rows
    (n_ghost, F).  The ExtractBExt analog (ref: src/parcsr_mv/
    par_csr_matrix.c hypre_ParCSRMatrixExtractBExt): the distributed
    setup ships whole MATRIX ROWS (cols+vals+flags packed on the F
    axis) to the shards whose rows reference them.  Runs inside
    shard_map, same schedule as exchange()."""
    n_shards = jax.lax.axis_size(cp.axis_name)
    F = X_loc.shape[1]
    ghost = jnp.zeros((cp.n_ghost + 1, F), dtype=X_loc.dtype)
    for r, off in enumerate(cp.offsets):
        perm = [(q, q - off) for q in range(n_shards)
                if 0 <= q - off < n_shards]
        buf = X_loc[cp.send_idx[0, r]] \
            * cp.send_mask[0, r][:, None].astype(X_loc.dtype)
        buf = jax.lax.ppermute(buf, cp.axis_name, perm)
        ghost = ghost.at[cp.recv_idx[0, r]].set(buf, mode="drop")
    return ghost[:-1]


def exchange_rev(g_vals: jax.Array, cp: CommPkg,
                 n_local: int) -> jax.Array:
    """REVERSE exchange with scatter-add: each shard's accumulated
    ghost-slot contributions g_vals ((n_ghost,) or (n_ghost, F)) travel
    back to the owners of those rows and ADD into a (n_local[, F])
    output.  This is hypre's reversed CommPkg (transpose matvec /
    distributed RAP row merge, ref: src/parcsr_mv/par_csr_matvec.c:
    368-480 and par_csr_triplemat.c) — the scatter half of every
    setup stage whose edges cross shard boundaries."""
    n_shards = jax.lax.axis_size(cp.axis_name)
    vec = g_vals.ndim == 1
    if vec:
        g_vals = g_vals[:, None]
    F = g_vals.shape[1]
    gpad = jnp.concatenate(
        [g_vals, jnp.zeros((1, F), g_vals.dtype)], axis=0)
    out = jnp.zeros((n_local, F), dtype=g_vals.dtype)
    for r, off in enumerate(cp.offsets):
        # forward: q -> p = q - off; reverse: p -> q = p + off
        perm = [(p, p + off) for p in range(n_shards)
                if 0 <= p + off < n_shards]
        buf = gpad[cp.recv_idx[0, r]]        # pad slots read the dump row
        buf = jax.lax.ppermute(buf, cp.axis_name, perm)
        out = out.at[cp.send_idx[0, r]].add(
            buf * cp.send_mask[0, r][:, None].astype(buf.dtype),
            mode="drop")
    return out[:, 0] if vec else out
