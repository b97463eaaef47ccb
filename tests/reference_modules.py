"""Load the reference's natten-free torch modules for parity testing.

Only src/layers/rope.py and src/layers/convolutions.py are importable without
the natten CUDA dependency; we load them by file path (the `src` package
itself pulls in natten via src/layers/__init__.py).
"""

import importlib.util
import sys

REFERENCE = "/root/reference"


def _load(name, rel):
    spec = importlib.util.spec_from_file_location(name, f"{REFERENCE}/{rel}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


ref_rope = _load("ref_rope", "src/layers/rope.py")
ref_conv = _load("ref_conv", "src/layers/convolutions.py")
