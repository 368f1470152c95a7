#!/usr/bin/env python
"""CLI front end: ``python pixray.py --drawer=pixel --prompts="a sunrise"``.

Drop-in equivalent of the reference's CLI (/root/reference/pixray.py:2126-2135),
plus re-exported module API for scripts that ``import pixray``.
"""

from pixray_tpu import (  # noqa: F401
    add_custom_loss,
    add_settings,
    apply_settings,
    do_init,
    do_run,
    get_settings,
    main,
    reset_settings,
    run,
)

if __name__ == "__main__":
    main()
