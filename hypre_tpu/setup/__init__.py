from hypre_tpu.setup.strength import strength_matrix  # noqa: F401
from hypre_tpu.setup.coarsen import pmis, C_PT, F_PT, SF_PT  # noqa: F401
from hypre_tpu.setup.interp import direct_interp, truncate_interp  # noqa: F401
from hypre_tpu.setup.l1norms import l1_norms  # noqa: F401
