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
