"""Collect the shim-fidelity goldens (parity/test_shim_fidelity.py) into
the main suite: hand-computed vectors pinning the torch parity shims
(PyG TransformerConv beta gating, natten window clamping) and the JAX
layers to the upstream semantics. The tests live next to the shims they
guard; this module makes `pytest tests/` (CI) run them."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parity.test_shim_fidelity import *  # noqa: F401,F403,E402
