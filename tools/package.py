"""Build er_engine.zip — the --py-files artifact for the contract's launch
mode (`spark-submit --py-files er_engine.zip run_pipeline.py ...`).

Pure-zip packaging (no setuptools): every .py under
dig_entity_resolution_spark/, archived with repo-root-relative paths so the
package imports the same way on executors as it does locally. Deterministic
(fixed timestamps) so repeated builds are byte-identical — rebuilds don't
churn cluster artifact caches.

Usage: python tools/package.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "dig_entity_resolution_spark"


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "er_engine.zip")
    entries = []
    for dirpath, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                entries.append((os.path.relpath(full, REPO), full))
    entries.sort()
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for rel, full in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(rel, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, data)
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
