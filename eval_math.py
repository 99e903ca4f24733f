#!/usr/bin/env python
"""Root CLI wrapper: score rollouts (same flags/outputs as the reference's
eval_math.py — see lapha_tpu/evalsuite/eval_math.py)."""

import lapha_tpu

lapha_tpu.apply_platform_env()

from lapha_tpu.evalsuite.eval_math import main

if __name__ == "__main__":
    main()
