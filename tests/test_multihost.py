"""Multi-host (multi-process) distributed training, simulated on CPU.

The reference has no distributed backend (SURVEY.md §2: no
torch.distributed anywhere). This exercises the real multi-controller
path: ``jax.distributed.initialize`` over localhost, a global mesh
spanning 2 processes x 4 virtual devices, halo-partitioned training with
the all_to_all crossing the process boundary, and loss parity against the
single-process 8-device run (scripts/multihost_sim.py).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_halo_training_matches_single_process():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # the script sets its own device counts
    env["MH_NODES"] = "512"
    env["MH_EDGES"] = "4096"
    env["MH_STEPS"] = "3"
    env["MH_PORT"] = "47651"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_sim.py")],
        env=env, capture_output=True, text=True, timeout=560, cwd=REPO)
    assert out.returncode == 0, out.stderr[-3000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["loss_parity"] is True
    assert rec["processes"] == 2 and rec["global_devices"] == 8
