#!/usr/bin/env python
"""Onset model test CLI (reference script/test_onset_model.py).

    python script/test_onset_model.py test --config CONFIG --ckpt_path DIR
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from syncfusion_tpu.core.cache import enable_compile_cache
enable_compile_cache()

from train_onset_model import main

if __name__ == "__main__":
    argv = sys.argv[1:]
    if not argv or argv[0] not in ("fit", "test", "validate"):
        argv = ["test"] + argv
    main(argv)
