"""Registry gate-prefix invariant — needs NO testdata or Spark session
(deliberately outside test_entry.py's skipif so the ordering regression
test cannot silently skip on machines without /root/testdata)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_rows_only_queries_register_last():
    """The driver gate recorded exactly the first 50 registry entries at
    r3 — hash-checkable queries must occupy the prefix so a coverage cap
    only ever drops rows-only-by-design configs. Ordered by REGISTRATION
    intent (registry sql is None), not by resolved oracle_sql(): a lazy
    oracle builder legitimately resolves to None when its fixture is
    absent, which degrades that entry to rows-only without being a
    registration-order regression (r4 review)."""
    from dig_entity_resolution_spark import queries as Q

    names = list(entrymod.queries())
    seen_rows_only = False
    for n in names:
        if Q._REGISTRY[n][1] is None:
            seen_rows_only = True
        else:
            assert not seen_rows_only, f"oracle-backed {n} after a rows-only entry"
    assert sum(Q._REGISTRY[n][1] is not None for n in names) >= 50
