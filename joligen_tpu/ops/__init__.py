from .schedules import (
    make_beta_schedule,
    NoiseSchedule,
    gamma_embedding,
    timestep_embedding,
)
from .upfirdn2d import upfirdn2d, upsample2d, downsample2d, setup_filter

__all__ = [
    "make_beta_schedule",
    "NoiseSchedule",
    "gamma_embedding",
    "timestep_embedding",
    "upfirdn2d",
    "upsample2d",
    "downsample2d",
    "setup_filter",
]
