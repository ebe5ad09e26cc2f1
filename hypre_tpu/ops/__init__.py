from hypre_tpu.ops.formats import (  # noqa: F401
    EllMatrix, DiaMatrix, SparseOp, ell_matvec, dia_matvec, matvec,
    ell_from_scipy, dia_from_scipy, sparse_op_from_scipy,
)
from hypre_tpu.ops import vector  # noqa: F401
