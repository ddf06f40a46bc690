"""Contract test for the multi-host scaling evidence channel.

`scripts/bench_multihost.py --dryrun` must run the REAL multi-process
measurement path end-to-end on this box (2 OS processes, jax.distributed,
virtual CPU devices) and emit the JSON the >=80%-at->=2-hosts BASELINE.md
target will be judged with on real pods. Absolute CPU numbers are
meaningless; the structure and the successful N-process run are the test.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multihost_bench_dryrun(tmp_path):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "bench_multihost.py"),
         "--nproc", "2", "--dryrun", "--tmpdir", str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, r.stdout + r.stderr
    line = next(ln for ln in reversed(r.stdout.splitlines())
                if ln.startswith("{"))
    res = json.loads(line)
    assert res["baseline_1proc"]["nproc"] == 1
    assert res["2proc"]["nproc"] == 2
    assert res["2proc"]["devices"] == 4  # 2 procs x 2 virtual devices
    assert res["2proc"]["global_batch"] == 2 * res["baseline_1proc"]["global_batch"]
    assert res["2proc"]["audio_s_per_s"] > 0
    assert 0 < res["scaling_efficiency"]
