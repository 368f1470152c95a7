"""Experiment: blocked-dispatch block size (8 = default vs 16/32).

Each block is one device dispatch (lax.scan over N steps); larger blocks
amortize the per-block host sync bubble further at the cost of one extra
compiled graph per size and longer time-to-first-frame.  Same-process,
interleaved (BENCH_NOTES round-2 methodology).

    python tools/exp11_block.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PIXRAY_TPU_NO_DOWNLOAD", "1")
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import CONFIGS, bench_config  # noqa: E402


def main():
    results = {}
    for n in (8, 16, 32, 8):  # repeat 8 last to bound drift
        overrides = dict(CONFIGS["pixel"], steps_per_call=n)
        sps = bench_config(f"pixel_b{n}", overrides, warmup=n + 1,
                           timed=2 * n, windows=2)
        results.setdefault(n, []).append(sps)
        print(f"block={n:3d}: {sps:6.2f} steps/s", flush=True)
    print(results, flush=True)


if __name__ == "__main__":
    sys.exit(main())
