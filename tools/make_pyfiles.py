#!/usr/bin/env python
"""Package otar3088_spark into a ``--py-files`` zip for spark-submit.

    python tools/make_pyfiles.py [dist/otar3088_spark.zip]

The archive contains the package's .py files with package-relative
arcnames, so adding it to --py-files puts ``otar3088_spark`` on every
executor's and the driver's sys.path — no install step on the cluster.
Deterministic: fixed timestamps, sorted entries (same input -> same bytes,
so artifact stores can dedup)."""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

PKG = "otar3088_spark"


def make_pyfiles(dest: str) -> list[str]:
    root = Path(__file__).resolve().parent.parent
    dest_p = Path(dest)
    dest_p.parent.mkdir(parents=True, exist_ok=True)
    names: list[str] = []
    with zipfile.ZipFile(dest_p, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in sorted((root / PKG).rglob("*.py")):
            arc = str(f.relative_to(root))
            info = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, f.read_bytes())
            names.append(arc)
    return names


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/otar3088_spark.zip"
    entries = make_pyfiles(out)
    print(f"{out}: {len(entries)} files")
