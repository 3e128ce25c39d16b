"""CLI for converting reference (PyTorch) state_dicts to flax param trees.

Thin wrapper around graph_weather_tpu.convert (see that module for the
mapping documentation).

Usage:
  python scripts/convert_torch.py --model forecaster --inp sd.npz --out params.msgpack
  python scripts/convert_torch.py --model denoiser --inp ckpt.pt --out params.msgpack
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_weather_tpu.convert import (  # noqa: F401 (re-export)
    convert_denoiser,
    convert_forecaster,
    main,
)

if __name__ == "__main__":
    main()
