"""Build the native preprocessing extension in place.

Reference counterpart: ``init.sh`` + ``lib/*/setup.py`` (SURVEY.md §3.5).
Usage:  python accel_tpu/native/setup.py build_ext --inplace
(or ``bash init.sh`` at the repo root).
"""

import os

import numpy as np
from setuptools import Extension, setup

here = os.path.dirname(os.path.abspath(__file__))

setup(
    name="accel_native",
    ext_modules=[
        Extension(
            "_accel_native",
            sources=[os.path.join(here, "_accel_native.cpp")],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17", "-march=native"],
        )
    ],
    script_args=["build_ext", "--build-lib", here, "--build-temp",
                 os.path.join(here, "build")],
)
