from hypre_tpu.parallel.partition import RowPartition  # noqa: F401
from hypre_tpu.parallel.comm import CommPkg, exchange  # noqa: F401
from hypre_tpu.parallel.parcsr import (  # noqa: F401
    ParCSR, par_matvec, parcsr_from_scipy, shard_vector, unshard_vector,
)
