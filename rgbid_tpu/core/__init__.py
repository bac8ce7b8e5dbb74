from .. import _precision  # noqa: F401  (forces f32 matmul precision)
from . import camera, config, se3  # noqa: F401
from .camera import Intrinsics, level_intrinsics, level_shape  # noqa: F401
from .config import (  # noqa: F401
    BackendConfig,
    FusionConfig,
    KeyframeConfig,
    SlamConfig,
    TrackingConfig,
)
