"""Driver-gate registry invariants (round-3 ADVICE): the driver
evaluates only the FIRST 50 ``queries()`` entries, so every key that has
an ``oracle_sql()`` value gate must sit inside that window — a future
insertion above the tail must fail loudly here, not silently push a
value-gated query out of the gate."""

from __future__ import annotations

DRIVER_WINDOW = 50


def test_every_gated_entry_inside_driver_window():
    import __spark_entry__ as entry

    keys = list(entry.queries())
    gated = list(entry.oracle_sql())
    # every oracle key names a registered query
    unknown = set(gated) - set(keys)
    assert not unknown, f"oracle_sql keys without a queries() entry: {unknown}"
    window = set(keys[:DRIVER_WINDOW])
    pushed_out = [k for k in gated if k not in window]
    assert not pushed_out, (
        f"value-gated entries fell outside the driver's first-{DRIVER_WINDOW} "
        f"window: {pushed_out} — reorder queries() so gated entries come first"
    )


def test_tail_entries_are_documented_rows_only():
    """Everything past the window must be rows-only by design (no oracle)
    — losing driver execution for a gated query costs evidence."""
    import __spark_entry__ as entry

    keys = list(entry.queries())
    gated = set(entry.oracle_sql())
    tail = keys[DRIVER_WINDOW:]
    assert all(k not in gated for k in tail)
