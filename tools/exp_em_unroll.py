#!/usr/bin/env python
"""A/B the fused EM round's scan unroll factors on hardware.

Decode's forward scan gained 1.9x from unroll=2 (PERFORMANCE.md); the
fused EM round's two scans (alpha-materializing forward + streaming
backward/M-step) shipped with unroll=1.  This sweeps
NANOCALL_EM_FWD_UNROLL x NANOCALL_EM_BWD_UNROLL by running
`bench.py --em` in a fresh process per variant (the factors are read at
trace time; the jit cache does not key on them).

Run detached (relay rules): nohup python tools/exp_em_unroll.py &
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(fwd, bwd):
    env = dict(os.environ,
               NANOCALL_EM_FWD_UNROLL=str(fwd),
               NANOCALL_EM_BWD_UNROLL=str(bwd))
    p = subprocess.run([sys.executable, "bench.py", "--em"], cwd=HERE,
                       env=env, capture_output=True, text=True, timeout=1800)
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    if not line:
        print(f"fwd={fwd} bwd={bwd}: FAILED\n{p.stdout[-300:]}\n"
              f"{p.stderr[-300:]}", flush=True)
        return
    d = json.loads(line[-1])
    det = d.get("detail", {})
    print(f"fwd={fwd} bwd={bwd}: {d['value']/1e6:.2f}M ev-rounds/s "
          f"ms_per_round={det.get('ms_per_round')}", flush=True)


def main():
    for fwd, bwd in ((1, 1), (2, 1), (4, 1), (1, 2), (2, 2), (1, 4)):
        run(fwd, bwd)


if __name__ == "__main__":
    main()
