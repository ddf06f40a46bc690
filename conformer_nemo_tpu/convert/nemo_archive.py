"""Read reference `.nemo` archives / lightning `.ckpt` files.

Parity target: `SaveRestoreConnector.restore_from`
(`/root/reference/nemo/core/connectors/save_restore_connector.py:34-115`):
a `.nemo` is a (possibly gzipped) tar of `model_config.yaml`,
`model_weights.ckpt` (torch serialization) and artifact files (tokenizer
model/vocab). This module extracts those pieces and returns the weights as
plain numpy keyed by the torch state_dict names, ready for
`nemo_weights.convert_*`.

torch is imported lazily (only needed to deserialize the checkpoint).
"""

from __future__ import annotations

import os
import tarfile
import tempfile

import numpy as np
import yaml


class _AnyTagLoader(yaml.SafeLoader):
    """OmegaConf YAML may carry custom tags; map unknown tags to plain data."""


def _unknown(loader, tag_suffix, node):
    if isinstance(node, yaml.MappingNode):
        return loader.construct_mapping(node)
    if isinstance(node, yaml.SequenceNode):
        return loader.construct_sequence(node)
    return loader.construct_scalar(node)


_AnyTagLoader.add_multi_constructor("", _unknown)


def load_torch_weights(path: str) -> dict:
    """torch checkpoint file -> flat {name: np.ndarray}.

    Accepts a raw state_dict (what .nemo stores) or a lightning checkpoint
    ({'state_dict': ...}); strips a leading 'model.' prefix if present."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj and not hasattr(
        next(iter(obj.values()), None), "numpy"
    ):
        obj = obj["state_dict"]
    sd = {}
    for k, v in obj.items():
        if not hasattr(v, "numpy"):
            continue
        if k.startswith("model."):
            k = k[len("model."):]
        sd[k] = v.detach().cpu().numpy()
    return sd


def load_nemo_archive(path: str, extract_dir: str | None = None):
    """-> (config dict, state {name: np.ndarray}, {member_name: path}).

    Artifact member names in .nemo archives may be hash-mangled
    (`<md5>_tokenizer.model`); the returned mapping also registers each file
    under its unmangled suffix so callers can look up 'tokenizer.model'."""
    tmp = extract_dir or tempfile.mkdtemp(prefix="nemo_import_")
    with tarfile.open(path, "r:*") as tar:
        tar.extractall(tmp, filter="data")
    cfg_path = os.path.join(tmp, "model_config.yaml")
    with open(cfg_path, encoding="utf-8") as f:
        config = yaml.load(f, Loader=_AnyTagLoader)
    weights = os.path.join(tmp, "model_weights.ckpt")
    state = load_torch_weights(weights)
    artifacts = {}
    for name in os.listdir(tmp):
        if name in ("model_config.yaml", "model_weights.ckpt"):
            continue
        p = os.path.join(tmp, name)
        artifacts[name] = p
        # unmangle "<md5hash>_tokenizer.model" -> "tokenizer.model"
        parts = name.split("_", 1)
        if len(parts) == 2 and len(parts[0]) == 32 and parts[1] not in artifacts:
            artifacts[parts[1]] = p
    return config, state, artifacts


def strip_targets(node):
    """Drop Hydra `_target_`-style reflection keys, keep the data schema."""
    if isinstance(node, dict):
        return {k: strip_targets(v) for k, v in node.items()
                if k not in ("_target_",)}
    if isinstance(node, list):
        return [strip_targets(v) for v in node]
    return node
