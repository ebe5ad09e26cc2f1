from hypre_tpu.struct.grid import (  # noqa: F401
    StructMatrix, struct_matvec, struct_matrix_from_stencil,
)
from hypre_tpu.struct.pfmg import PFMG, PfmgConfig  # noqa: F401
from hypre_tpu.struct.par_struct import (  # noqa: F401
    ParPFMG, ParSMG, ParSysPFMG, par_struct_pcg,
)
from hypre_tpu.struct.boxes import (  # noqa: F401
    Box, BoxArray, BoxManager, StructGrid,
)
