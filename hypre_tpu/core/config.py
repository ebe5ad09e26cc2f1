"""Global handle / configuration.

TPU-native analog of hypre's process-wide handle (`hypre_Handle`,
ref: src/utilities/handle.h:34-81 and HYPRE_Initialize,
src/utilities/general.c:376).  Instead of device streams / memory
locations / vendor-library handles, the knobs that matter on TPU are the
floating dtype of values, the integer dtypes for local/global indices
(hypre's --enable-mixedint: HYPRE_Int vs HYPRE_BigInt,
ref: src/utilities/HYPRE_utilities.h:36-61), and default execution
choices for the setup phase (host numpy vs jitted device path).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Config:
    """Library-wide configuration, the `hypre_Handle` analog.

    real_dtype:  value dtype.  float64 mirrors hypre's default build;
                 float32 mirrors --enable-single and is the native TPU
                 precision (TPU f64 is software-emulated).
    int_dtype:   local index dtype (HYPRE_Int analog).
    big_int_dtype: global index dtype (HYPRE_BigInt analog).
    seed:        deterministic seed for the PMIS random measure hash
                 (hypre uses a deterministic LCG, src/utilities/random.c).
    spmv_pallas: use the Pallas ELL SpMV kernel where shapes allow
                 (falls back to pure-jnp gather formulation otherwise).
    """

    real_dtype: jnp.dtype = jnp.float64
    int_dtype: jnp.dtype = jnp.int32
    big_int_dtype: jnp.dtype = jnp.int64
    seed: int = 2747
    spmv_pallas: bool = True
    log_level: int = 0

    @property
    def np_real(self):
        return np.dtype(self.real_dtype)


_config: Optional[Config] = None


def get_config() -> Config:
    global _config
    if _config is None:
        _config = Config()
        # Outside an x64-enabled context fall back to f32 so arrays do
        # not get silently truncated by jax.
        import jax

        if not jax.config.jax_enable_x64:
            _config.real_dtype = jnp.float32
            _config.big_int_dtype = jnp.int32
    return _config


def set_config(cfg: Config) -> None:
    global _config
    _config = cfg
