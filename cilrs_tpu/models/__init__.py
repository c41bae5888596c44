"""Neural network models (Flax): ResNet-34 trunk, CILRS policy, losses."""

from cilrs_tpu.models.cilrs import CILRS  # noqa: F401
from cilrs_tpu.models.losses import cilrs_loss  # noqa: F401
from cilrs_tpu.models.resnet import ResNet34  # noqa: F401
