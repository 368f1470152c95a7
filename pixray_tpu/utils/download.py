"""Model-asset downloader (reference util.py:263-269 wget_file equivalent).

Tries urllib with a browser UA, then a wget subprocess.  Failures are
non-fatal (the reference ignored wget's exit codes too — SURVEY.md §5 notes this
as a robustness hole; here the caller gets a clear False instead of silence).
Zero-egress environments simply fall through to the random-weights path.
"""

from __future__ import annotations

import os
import subprocess
import time
import urllib.request


def wget_file(url: str, out: str) -> bool:
    if os.environ.get("PIXRAY_TPU_NO_DOWNLOAD") == "1":
        print(f"PIXRAY_TPU_NO_DOWNLOAD=1: skipping fetch of {out}")
        return False
    d = os.path.dirname(out)
    if d:
        os.makedirs(d, exist_ok=True)
    print(f"Downloading {out} from {url}, please wait")
    for attempt in range(3):
        try:
            req = urllib.request.Request(url, headers={"User-Agent": "Mozilla/5.0"})
            with urllib.request.urlopen(req, timeout=15) as resp, open(out + ".part", "wb") as f:
                while True:
                    chunk = resp.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)
            os.replace(out + ".part", out)
            return True
        except Exception as e:
            if attempt < 2:
                wait = 2 ** attempt
                print(f"download attempt {attempt + 1} failed ({e}); retrying in {wait}s")
                time.sleep(wait)
            else:
                print(f"urllib download failed ({e}); trying wget")
    try:
        subprocess.check_output(["wget", "-O", out, url])
        return os.path.exists(out) and os.path.getsize(out) > 0
    except Exception as e:
        print(f"Download unavailable ({e}) — continuing without {out}")
        for candidate in (out, out + ".part"):
            if os.path.exists(candidate) and os.path.getsize(candidate) == 0:
                os.remove(candidate)
        return False
