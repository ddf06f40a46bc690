"""Packaging surface (reference setup.py analogue): pyproject metadata and
importability without the repo-root path hack."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyproject_is_buildable_metadata():
    import tomllib

    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    assert meta["project"]["name"] == "conformer-nemo-tpu"
    assert "jax" in meta["project"]["dependencies"]
    assert "asr" in meta["project"]["optional-dependencies"]


def test_package_importable_from_any_cwd(tmp_path):
    """`import conformer_nemo_tpu` must work outside the repo dir (editable
    install or PYTHONPATH) — the CLI scripts rely on it."""
    env = dict(os.environ)
    # prepend ROOT (the box may already set PYTHONPATH, e.g. the axon site)
    existing = env.get("PYTHONPATH")
    env["PYTHONPATH"] = ROOT + (os.pathsep + existing if existing else "")
    r = subprocess.run(
        [sys.executable, "-c",
         "import conformer_nemo_tpu; import conformer_nemo_tpu.api"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, r.stderr[-1500:]
