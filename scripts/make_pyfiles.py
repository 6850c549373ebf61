"""Build the --py-files archive for cluster submission.

The north-rule invocation is

    spark-submit --py-files dist/wcs.zip jobs/crawl.py ...

on a multi-executor cluster: the driver adds the zip to ``sys.path`` and
ships it to every executor, whose Python workers import
``web_crawler_spark`` from it (no repo checkout on the workers).  This
script produces that archive deterministically (sorted entries, zeroed
timestamps — byte-identical rebuilds, so snapshot/resume jobs can assert
the code they resumed with).

Usage: python scripts/make_pyfiles.py [out_zip]   (default dist/wcs.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "wcs.zip")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    pkg = os.path.join(REPO, "web_crawler_spark")
    entries = []
    for root, _, files in os.walk(pkg):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                entries.append((os.path.relpath(p, REPO), p))
    tmp = out + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, path in sorted(entries):
            with open(path, "rb") as fh:
                info = zipfile.ZipInfo(arcname)  # fixed (1980) timestamp
                info.compress_type = zipfile.ZIP_DEFLATED
                z.writestr(info, fh.read())
    os.replace(tmp, out)
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
