"""Load the reference's own torch submodules without its heavy deps.

The reference package __init__ chain pulls hydra/omegaconf/lightning (absent
here), but the Conformer building blocks themselves
(`/root/reference/nemo/collections/asr/parts/submodules/*.py`,
`/root/reference/nemo/collections/common/parts/rnn.py`) import only torch.
We pre-register stub parent packages + a stub `nemo.utils.logging`, then exec
the real module files — so parity tests run against the REFERENCE's code,
not a re-implementation.
"""

import importlib.util
import sys
import types

REF = "/root/reference"

_PKGS = [
    "nemo",
    "nemo.utils",
    "nemo.collections",
    "nemo.collections.common",
    "nemo.collections.common.parts",
    "nemo.collections.asr",
    "nemo.collections.asr.parts",
    "nemo.collections.asr.parts.utils",
    "nemo.collections.asr.parts.submodules",
]

_MODULES = {
    "nemo.collections.asr.parts.utils.activations":
        f"{REF}/nemo/collections/asr/parts/utils/activations.py",
    "nemo.collections.asr.parts.submodules.multi_head_attention":
        f"{REF}/nemo/collections/asr/parts/submodules/multi_head_attention.py",
    "nemo.collections.asr.parts.submodules.conformer_modules":
        f"{REF}/nemo/collections/asr/parts/submodules/conformer_modules.py",
    "nemo.collections.asr.parts.submodules.subsampling":
        f"{REF}/nemo/collections/asr/parts/submodules/subsampling.py",
    "nemo.collections.common.parts.rnn":
        f"{REF}/nemo/collections/common/parts/rnn.py",
}


def load_reference_modules():
    """-> dict of the five loaded reference modules (cached after first call)."""
    if _MODULES[next(iter(_MODULES))] and "nemo.collections.asr.parts.submodules.conformer_modules" in sys.modules:
        return {name: sys.modules[name] for name in _MODULES}
    for pkg in _PKGS:
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m
    # stub logger used by rnn.py
    logging = types.ModuleType("nemo.utils.logging")
    for fn in ("info", "warning", "error", "debug"):
        setattr(logging, fn, lambda *a, **k: None)
    sys.modules["nemo.utils.logging"] = logging
    sys.modules["nemo.utils"].logging = logging

    out = {}
    for name, path in _MODULES.items():
        if name in sys.modules:
            out[name] = sys.modules[name]
            continue
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        out[name] = mod
    return out
