#!/usr/bin/env python
"""Combined train-then-test launcher.

Reference counterpart: ``experiments/<net>/<net>_end2end_train_test.py``
(SURVEY.md L7) — sets up paths, trains, then evaluates with the same cfg.

Usage: python experiments/train_test.py --cfg experiments/cfgs/accel18_cityscapes.yaml
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    args = sys.argv[1:]
    for script in ("train.py", "test.py"):
        cmd = [sys.executable, os.path.join(HERE, script), *args]
        print("+", " ".join(cmd), flush=True)
        rc = subprocess.call(cmd)
        if rc != 0:
            sys.exit(rc)


if __name__ == "__main__":
    main()
