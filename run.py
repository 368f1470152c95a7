#!/usr/bin/env python
"""YAML runner: ``python run.py settings.yaml [output_dir]``.

Parity with the reference's run.py (loads a YAML of settings, runs one session).
"""

import sys

import yaml

import pixray_tpu as pixray


def main():
    if len(sys.argv) < 2:
        print("usage: run.py <settings.yaml> [outdir]")
        sys.exit(1)
    with open(sys.argv[1]) as f:
        settings = yaml.safe_load(f)
    if len(sys.argv) > 2:
        settings["outdir"] = sys.argv[2]

    pixray.reset_settings()
    pixray.add_settings(**settings)
    resolved = pixray.apply_settings()
    pixray.do_init(resolved)
    pixray.do_run(resolved)


if __name__ == "__main__":
    main()
