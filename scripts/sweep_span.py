"""Post-r4 span-kernel tiling sweep (fetch-synced, one config per run).

The r3 bucket-size conclusion ("time tracks padded E, s=512 optimal")
was measured while the kernels streamed 128x-padded [Ep, 1] operands —
the padded-edge penalty is far smaller after the tile-packing fix, so
the one-hot-vs-padding balance may have moved. Sweeps RGCN_SPAN_* knobs
by re-execing the bench pieces (knobs are read at import).

Run: python scripts/sweep_span.py [pieces...]   (defaults: k1f k1b)
Env per arm is set by this driver; each arm runs scripts/true_piece.py.
"""
import itertools
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

pieces = sys.argv[1:] or ["k1f", "k1b"]
grid = {
    "RGCN_SPAN_BUCKET_ROWS": ["128", "256", "512"],
    "RGCN_SPAN_K": ["8", "16"],
}

base = dict(os.environ)
for s, k in itertools.product(*grid.values()):
    env = dict(base, RGCN_SPAN_BUCKET_ROWS=s, RGCN_SPAN_K=k)
    for piece in pieces:
        env["PIECE"] = piece
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "true_piece.py")],
            env=env, capture_output=True, text=True, timeout=1200)
        line = [l for l in r.stdout.splitlines() if l.strip().startswith(piece)]
        print(f"s={s:>4} kspan={k:>2} {line[0] if line else 'FAILED: ' + r.stderr.splitlines()[-1][:120] if r.stderr else 'no output'}",
              flush=True)
