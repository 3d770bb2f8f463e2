from accel_tpu.config.loader import (  # noqa: F401
    Config,
    default_config,
    load_config,
    update_config,
)
