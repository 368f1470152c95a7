"""Batch generator: render a list of (prompt, template-overlay) jobs — the shape
of the reference's examples/loot.py NFT pipeline, parameterized from a YAML file
instead of a hardcoded table.

    python examples/batch_nft.py jobs.yaml outputs/batch

jobs.yaml:
    - prompt: "hard leather armor #pixelart"
      overlay: templates/armor.png
    - prompt: "gold ring #pixelart"

Each job runs a fresh pixel-drawer session; overlays (when given) are applied on
the reference's overlay schedule.  Seed sweeps parallelize across hosts — run one
process per host with a different --seed.
"""

import sys

import yaml

import pixray_tpu as pixray


def main():
    jobs_file = sys.argv[1] if len(sys.argv) > 1 else "jobs.yaml"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "outputs/batch"
    with open(jobs_file) as f:
        jobs = yaml.safe_load(f)

    for i, job in enumerate(jobs):
        settings = dict(
            prompts=job["prompt"],
            drawer=job.get("drawer", "pixel"),
            quality=job.get("quality", "draft"),
            outdir=f"{outdir}/{i:03d}",
        )
        if job.get("overlay"):
            settings.update(overlay_image=job["overlay"], overlay_every="10i")
        pixray.reset_settings()
        pixray.add_settings(**settings)
        resolved = pixray.apply_settings()
        pixray.do_init(resolved)
        pixray.do_run(resolved)


if __name__ == "__main__":
    main()
