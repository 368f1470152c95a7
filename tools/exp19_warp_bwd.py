"""Round-5: int8 banded warp BACKWARD rung, A/B'd end-to-end.

The warp custom-calls are ~6.5 ms of the 17 ms flagship step (BENCH_NOTES
round-4 decomposition) and the transposed-banded backward is the larger half
of that.  The forward already runs int8; this measures whether quantizing the
banded hat-with-cotangent contraction (PIXRAY_TPU_WARP_BWD_PREC=int8) buys
MXU rate there too.  Interleaved bf16/int8 pairs bound chip-throttle drift
(BENCH_NOTES round-2 methodology).

    python tools/exp19_warp_bwd.py
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OVERLAYS = [
    ("bf16 bwd (r4 default)", {"PIXRAY_TPU_WARP_BWD_PREC": "bf16"}),
    ("int8 bwd", {"PIXRAY_TPU_WARP_BWD_PREC": "int8"}),
    ("bf16 bwd again", {"PIXRAY_TPU_WARP_BWD_PREC": "bf16"}),
    ("int8 bwd again", {"PIXRAY_TPU_WARP_BWD_PREC": "int8"}),
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
