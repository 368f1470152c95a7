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

    # ---- parse: per-op device self time from the "XLA Ops" trace line
    # (tensorboard_plugin_profile's converter is protobuf-version-broken in
    # this image; the xplane proto from tensorflow.tsl parses fine)
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from collections import defaultdict

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspaces = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not xspaces:
        print("no xplane found", flush=True)
        return 1
    sp = xplane_pb2.XSpace()
    with open(xspaces[-1], "rb") as f:
        sp.ParseFromString(f.read())
    steps = 16
    for p in sp.planes:
        if "TPU" not in p.name:
            continue
        ev_names = {k: v.name for k, v in p.event_metadata.items()}
        for line in p.lines:
            if line.name != "XLA Ops":
                continue
            tot = defaultdict(int)
            cnt = defaultdict(int)
            for ev in line.events:
                nm = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                tot[nm] += ev.duration_ps
                cnt[nm] += 1
            # the %while wrapper's duration covers its children — report it as
            # the step wall but exclude it from the category sums
            wall_ps = sum(ps for nm, ps in tot.items() if nm.startswith("%while"))
            inner = {nm: ps for nm, ps in tot.items() if not nm.startswith("%while")}
            T = sum(inner.values())
            print(f'"XLA Ops" events={sum(cnt.values())}; while-wall '
                  f"{wall_ps / 1e9 / steps:.2f} ms/step; op-self total "
                  f"{T / 1e9 / steps:.2f} ms/step ({steps} steps traced)", flush=True)
            for nm, ps in sorted(inner.items(), key=lambda kv: -kv[1])[:25]:
                print(f"  {ps / 1e9:9.3f} ms {100 * ps / T:5.1f}%  n={cnt[nm]:<5} {nm[:110]}",
                      flush=True)

            def category(nm):
                if " custom-call(" in nm:
                    return "pallas custom-call"
                if nm.startswith(("%copy", "%bitcast", "%reshape", "%transpose")):
                    return "layout copy/reshape"
                if "224,224" in nm and ("768" in nm or "3072" in nm or "50176" in nm):
                    return "clip patchify boundary"
                if "224,224" in nm:
                    return "cutout epilogue (64x224x224 elementwise)"
                if "768" in nm or "3072" in nm or "64,50" in nm or "50,64" in nm:
                    return "clip tower"
                if "convolution" in nm or "dot" in nm:
                    return "matmul/conv other"
                return "other"

            cats = defaultdict(int)
            for nm, ps in inner.items():
                cats[category(nm)] += ps
            print("-- category sums (op self time, ms/step) --", flush=True)
            for c, ps in sorted(cats.items(), key=lambda kv: -kv[1]):
                print(f"  {ps / 1e9 / steps:7.2f} ms/step {100 * ps / T:5.1f}%  {c}", flush=True)
            out = os.path.join(trace_dir, "op_table.json")
            import json
            with open(out, "w") as f:
                json.dump({nm: {"ms": ps / 1e9, "n": cnt[nm]} for nm, ps in inner.items()}, f)
            print(f"full table -> {out}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
