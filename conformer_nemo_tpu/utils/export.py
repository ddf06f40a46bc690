"""Serialized-inference export (the reference `Exportable` analogue).

Parity target: `nemo/core/classes/exportable.py:37` — `model.export(path)`
turns the trained torch modules into a deployment artifact (ONNX /
TorchScript) built from `input_example()`. The TPU-native artifact is
**StableHLO** via `jax.export`: each exported function is traced once at a
static example shape, serialized with its weights baked in as constants, and
can be reloaded into any JAX/XLA runtime (including a PJRT C-API server)
without this package's Python code.

Archive layout (one tar.gz, mirroring the reference's one-file-per-module
export of encoder/decoder pairs, `exportable.py:71-105`):
    manifest.json            {"functions": {name: {"file", "in_avals"}}}
    <name>.stablehlo         jax.export serialized bytes

Multi-shape serving should export one function per duration bucket (static
shapes are the TPU contract; see SURVEY.md §7 hard-parts #2).
"""

from __future__ import annotations

import io
import json
import tarfile
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax


def export_fn(
    fn: Callable,
    example_args: Tuple,
    *,
    platforms: Optional[Sequence[str]] = None,
) -> "jax.export.Exported":
    """Trace + lower `fn` at `example_args` (arrays or ShapeDtypeStructs).

    `platforms` defaults to the current backend; pass e.g. ("tpu", "cpu")
    for a cross-platform artifact.
    """
    jitted = fn if isinstance(fn, jax.stages.Wrapped) else jax.jit(fn)
    kwargs = {}
    if platforms:
        kwargs["platforms"] = tuple(platforms)
    return jax.export.export(jitted, **kwargs)(*example_args)


def save_exported(path: str, functions: Dict[str, "jax.export.Exported"]) -> str:
    """Write a tar.gz of serialized StableHLO functions."""
    manifest = {"format": "conformer_nemo_tpu.stablehlo.v1", "functions": {}}
    blobs = {}
    for name, exported in functions.items():
        data = bytes(exported.serialize())
        fname = f"{name}.stablehlo"
        blobs[fname] = data
        manifest["functions"][name] = {
            "file": fname,
            "in_avals": [str(a) for a in exported.in_avals],
            "platforms": list(exported.platforms),
        }
    with tarfile.open(path, "w:gz") as tar:
        mdata = json.dumps(manifest, indent=1).encode()
        info = tarfile.TarInfo("manifest.json")
        info.size = len(mdata)
        tar.addfile(info, io.BytesIO(mdata))
        for fname, data in blobs.items():
            info = tarfile.TarInfo(fname)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    return path


def load_exported(path: str) -> Dict[str, Callable]:
    """Reload an export archive -> {name: callable} (each calls the
    deserialized StableHLO via `Exported.call`)."""
    out: Dict[str, Callable] = {}
    with tarfile.open(path, "r:gz") as tar:
        manifest = json.loads(tar.extractfile("manifest.json").read())
        for name, meta in manifest["functions"].items():
            data = tar.extractfile(meta["file"]).read()
            exported = jax.export.deserialize(bytearray(data))
            out[name] = exported.call
    return out
