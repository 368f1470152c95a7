"""Round-5: int8-backward (dx) rung + block-size sweep, A/B'd end-to-end.

Sequential bench.py subprocesses (one exclusive TPU), BENCH_NOTES round-2
methodology.  int8 forward is the default since round 5; this measures
whether quantizing the dx dot (2x the forward FLOPs) buys more, and whether
larger dispatch blocks amortize the host-sync bubble further.

    python tools/exp12_int8b.py
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OVERLAYS = [
    ("int8 (default)", {}),
    ("int8b (int8 dx bwd)", {"PIXRAY_TPU_CLIP_PREC": "int8b"}),
    ("bf16 (r1-r4 default)", {"PIXRAY_TPU_CLIP_PREC": "bf16"}),
    ("int8 again (drift bound)", {}),
]


def run(env_overlay):
    env = dict(os.environ, PIXRAY_TPU_BENCH_SMOKE="0",
               PIXRAY_TPU_BENCH_CONFIGS="0", **env_overlay)
    out = subprocess.run([sys.executable, os.path.join(HERE, "bench.py")],
                         env=env, capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        return None, (out.stdout + out.stderr)[-500:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    return d, None


def main():
    for name, overlay in OVERLAYS:
        d, err = run(overlay)
        if d is None:
            print(f"{name:28s}: FAILED {err}", flush=True)
        else:
            print(f"{name:28s}: {d['value']:6.2f} steps/s  "
                  f"calib {d['calib_matmul_tflops']}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
