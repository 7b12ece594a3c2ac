from ccst_tpu.ops.adain import (
    adain,
    adain_from_stats,
    calc_mean_std,
    coral,
)
from ccst_tpu.ops.welford import (
    WelfordState,
    welford_init,
    welford_update,
    welford_merge,
    welford_finalize,
)

__all__ = [
    "adain",
    "adain_from_stats",
    "calc_mean_std",
    "coral",
    "WelfordState",
    "welford_init",
    "welford_update",
    "welford_merge",
    "welford_finalize",
]
