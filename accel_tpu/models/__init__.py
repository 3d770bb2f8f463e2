from accel_tpu.models.resnet import DilatedResNet  # noqa: F401
from accel_tpu.models.deeplab import DeepLabHead, DeepLab  # noqa: F401
from accel_tpu.models.flownet import FlowNetS  # noqa: F401
from accel_tpu.models.accel import AccelNet, build_model  # noqa: F401
