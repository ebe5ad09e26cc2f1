from hypre_tpu.solvers.amg import BoomerAMG, AmgConfig  # noqa: F401
from hypre_tpu.solvers.krylov import pcg, PcgResult  # noqa: F401
from hypre_tpu.solvers.krylov_more import (  # noqa: F401
    gmres, flexgmres, lgmres, cogmres, bicgstab, cgnr, KrylovResult,
)
from hypre_tpu.solvers.hybrid import (  # noqa: F401
    hybrid_solve, HybridConfig, HybridResult,
)
from hypre_tpu.solvers.lobpcg import lobpcg, LobpcgResult  # noqa: F401
from hypre_tpu.solvers.fsai import FSAI, FsaiConfig  # noqa: F401
from hypre_tpu.solvers.parasails import ParaSails, ParaSailsConfig  # noqa: F401
from hypre_tpu.solvers.ilu import ILU, IluConfig  # noqa: F401
from hypre_tpu.solvers.schwarz import Schwarz, SchwarzConfig  # noqa: F401
from hypre_tpu.solvers.ams import AMS, AmsConfig  # noqa: F401
from hypre_tpu.solvers.mgr import MGR, MgrConfig  # noqa: F401
from hypre_tpu.solvers.ams import ADS, AME  # noqa: F401
