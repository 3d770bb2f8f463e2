from accel_tpu.ops.warp import bilinear_warp, bilinear_warp_xla, bilinear_warp_pallas  # noqa: F401
from accel_tpu.ops.upsample import bilinear_upsample, resize_bilinear  # noqa: F401
