"""Reusable array ops: image preprocessing/augmentation, temporal filters."""

from cilrs_tpu.ops.image import preprocess_frame, augment_batch  # noqa: F401
from cilrs_tpu.ops.filters import SmoothingState, smooth_controls, init_smoothing  # noqa: F401
