"""Import the framework's src/ CLI entry points by file path under unique
module names. Bare ``import preproc`` is ambiguous once the reference oracle
puts /root/reference/src on sys.path (it has its own train/infer/preproc
modules with the same generic names); collection order then decides which
tree wins. Path-based loading removes the race entirely.
"""

import importlib.util
import os
import sys

_SRC = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "src"))
_cache = {}


def load_cli(name: str):
    if name in _cache:
        return _cache[name]
    modname = f"pseld_cli_{name}"
    spec = importlib.util.spec_from_file_location(
        modname, os.path.join(_SRC, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    _cache[name] = mod
    return mod
