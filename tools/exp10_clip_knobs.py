"""Round-5 flagship knob sweep: CLIP-side precision/layout levers, A/B'd
end-to-end (the only measurement this relay environment trusts — see
BENCH_NOTES round-2 methodology).

Runs `bench.py` (flagship only, smoke off) in sequential subprocesses (one
exclusive TPU) with each env overlay and prints a ladder.  Usage:

    python tools/exp10_clip_knobs.py [--quick]
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OVERLAYS = [
    ("baseline (int8b+preq)", {}),
    ("attn=einsum", {"PIXRAY_TPU_CLIP_ATTN": "einsum"}),
    ("ln=bf16", {"PIXRAY_TPU_CLIP_LN32": "0"}),
    ("ln=bf16 + attn=einsum", {"PIXRAY_TPU_CLIP_LN32": "0",
                               "PIXRAY_TPU_CLIP_ATTN": "einsum"}),
    ("remat", {"PIXRAY_TPU_CLIP_REMAT": "1"}),
    ("baseline again (drift)", {}),
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
    overlays = OVERLAYS[:2] if "--quick" in sys.argv else OVERLAYS
    for name, overlay in overlays:
        d, err = run(overlay)
        if d is None:
            print(f"{name:28s}: FAILED {err}", flush=True)
        else:
            print(f"{name:28s}: {d['value']:6.2f} steps/s  "
                  f"calib {d['calib_matmul_tflops']}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
