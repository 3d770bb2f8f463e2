"""Per-experiment logger factory.

Reference counterpart: ``lib/utils/create_logger.py`` — creates the
experiment output directory and a timestamped logfile (SURVEY.md §2).
"""

from __future__ import annotations

import logging
import os
import time


def create_logger(output_path: str, cfg_name: str, image_set: str = "") -> tuple[logging.Logger, str]:
    """Create output dir + file/console logger; returns (logger, final_output_path)."""
    final_output_path = os.path.join(output_path, cfg_name, image_set) if image_set else os.path.join(output_path, cfg_name)
    os.makedirs(final_output_path, exist_ok=True)

    log_file = os.path.join(
        final_output_path, "{}_{}.log".format(cfg_name, time.strftime("%Y-%m-%d-%H-%M"))
    )
    logger = logging.getLogger(f"accel_tpu.{cfg_name}")
    logger.setLevel(logging.INFO)
    logger.propagate = False
    # idempotent: don't stack handlers on repeated calls
    if not logger.handlers:
        fmt = logging.Formatter("%(asctime)s %(message)s")
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(fh)
        logger.addHandler(sh)
    return logger, final_output_path
