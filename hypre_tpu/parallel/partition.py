"""Row partitioning over a 1-D device mesh.

Analog of hypre's 1-D block-row partition (`row_starts`, ref:
src/parcsr_mv/par_csr_matrix.h:51; hypre_GeneratePartitioning,
src/seq_mv/genpart.c).  The TPU twist: XLA wants equal static shapes
per shard, so the global size is padded up to n_shards * n_local with
decoupled identity rows (b = 0 on padding, so padded entries stay
exactly zero through every solver iteration and never perturb inner
products).
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class RowPartition:
    n_global: int          # true (unpadded) global size
    n_shards: int
    n_local: int           # padded equal local size

    @staticmethod
    def create(n_global: int, n_shards: int) -> "RowPartition":
        n_local = -(-n_global // n_shards)
        return RowPartition(n_global, n_shards, n_local)

    @property
    def n_padded(self) -> int:
        return self.n_shards * self.n_local

    def owner(self, gid):
        """Owning shard of (padded) global row ids."""
        return np.minimum(np.asarray(gid) // self.n_local, self.n_shards - 1)

    def local_index(self, gid):
        return np.asarray(gid) - self.owner(gid) * self.n_local

    def shard_starts(self) -> np.ndarray:
        return np.arange(self.n_shards + 1) * self.n_local


@dataclasses.dataclass(frozen=True)
class GenPartition:
    """General (unequal) contiguous row partition: shard p owns global
    ids [starts[p], starts[p+1]), stored in local slots [0, count_p) of
    n_local padded slots.  This is hypre's true row_starts partition
    (ref: src/parcsr_mv/par_csr_matrix.h:51) — the distributed AMG
    setup produces UNEQUAL coarse partitions (each shard keeps its own
    C points; no renumber-and-rebalance step, matching hypre), padded
    to a static per-shard width for XLA.
    """

    starts: tuple          # len n_shards + 1, ascending
    n_local: int           # static padded local width (>= max count)

    @staticmethod
    def create(counts) -> "GenPartition":
        counts = np.asarray(counts, dtype=np.int64)
        starts = np.concatenate([[0], np.cumsum(counts)])
        return GenPartition(starts=tuple(int(s) for s in starts),
                            n_local=int(max(counts.max(initial=0), 1)))

    @property
    def n_shards(self) -> int:
        return len(self.starts) - 1

    @property
    def n_global(self) -> int:
        return int(self.starts[-1])

    @property
    def n_padded(self) -> int:
        return self.n_shards * self.n_local

    def counts(self) -> np.ndarray:
        s = np.asarray(self.starts)
        return (s[1:] - s[:-1]).astype(np.int64)

    def owner(self, gid):
        s = np.asarray(self.starts)
        return np.clip(np.searchsorted(s, np.asarray(gid), side="right")
                       - 1, 0, self.n_shards - 1)

    def local_index(self, gid):
        s = np.asarray(self.starts)
        return np.asarray(gid) - s[self.owner(gid)]

    def shard_starts(self) -> np.ndarray:
        return np.asarray(self.starts)
