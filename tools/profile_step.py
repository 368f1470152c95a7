"""Device-profile the flagship step and print an XLA-op time table.

Runs the flagship config (pixel 80x45 + ViT-B/32 + 64 cuts) for a few warm
blocks under jax.profiler, then parses the xplane with
tensorboard_plugin_profile and prints per-op-category device times — the
round-over-round decomposition table in BENCH_NOTES.md comes from this.

Run on TPU:  python tools/profile_step.py [trace_dir]
"""

import glob
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


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pixray_trace"
    from pixray_tpu.config import apply_settings
    from pixray_tpu.engine.core import Engine

    settings = apply_settings(
        dict(
            drawer="pixel", prompts="sunrise", clip_models="ViT-B/32",
            size=[384, 216], num_cuts=64, batches=1, iterations=100,
            save_every=100000, display_every=100000, init_noise=None,
            vector_prompts="none", seed=1, outdir="", save_intermediates=False,
            learning_rate_drops=[],
        ),
        apply_side_effects=False,
    )
    e = Engine(settings)
    for it in range(9):  # warm: compile + first block
        e.train(it)
    with jax.profiler.trace(trace_dir):
        for it in range(9, 25):  # two 8-step blocks
            e.train(it)
    print(f"trace written to {trace_dir}", flush=True)

    # ---- parse: aggregate device-op self time by (category, op-name prefix)
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xspaces = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not xspaces:
        print("no xplane found", flush=True)
        return 1
    params = {"graph_viewer_options": {}}
    data, _ = rtd.xspace_to_tool_data([xspaces[-1]], "framework_op_stats^", params)
    # data is a gviz JSON/csv blob; dump raw for the caller to eyeball
    out = os.path.join(trace_dir, "op_stats.json")
    with open(out, "w") as f:
        f.write(data if isinstance(data, str) else data.decode())
    print(f"op stats -> {out}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
