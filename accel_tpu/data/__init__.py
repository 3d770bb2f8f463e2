from accel_tpu.data.imdb import IMDB  # noqa: F401
from accel_tpu.data.cityscapes import Cityscape  # noqa: F401
from accel_tpu.data.camvid import CamVid  # noqa: F401
