"""Contract guard [BASELINE.json:15]: no per-row Python UDFs anywhere.

Greps the package source for `F.udf(` / `functions.udf(` / `@udf` — the
row-at-a-time API — which is forbidden; only pandas_udf / mapInPandas /
applyInPandas (Arrow-vectorized) are allowed.
"""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parents[1] / "dig_entity_resolution_spark"

FORBIDDEN = re.compile(r"(?<!pandas_)\budf\s*\(|@udf\b|\.rdd\b|\bRDD\b")


def test_no_row_udfs_or_rdds():
    offenders = []
    for py in PKG.rglob("*.py"):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]
            if FORBIDDEN.search(code):
                offenders.append(f"{py.name}:{i}: {line.strip()}")
    assert not offenders, "\n".join(offenders)
