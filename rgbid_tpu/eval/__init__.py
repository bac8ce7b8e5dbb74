from .metrics import (  # noqa: F401
    absolute_trajectory_error,
    relative_pose_error,
    trajectory_from_tum_rows,
    umeyama_alignment,
)
