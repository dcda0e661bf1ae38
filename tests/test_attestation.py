"""Attestation-window invariants (CORRECTNESS_LOCAL.md).

The driver attests the FIRST 50 entries of queries(); these gates make the
rotation contract structural so a reorder mistake can't silently starve a
twin of fresh correctness rows.
"""

import __spark_entry__ as drv

WINDOW = 50


def test_window_composition():
    q, o = drv.queries(), drv.oracle_sql()
    names = list(q)
    first = names[:WINDOW]
    # every windowed slot burns on a hash-attestable twin
    assert all(n in o for n in first), [n for n in first if n not in o]
    # the priority list is entirely inside the window
    assert set(drv._ATTEST_FIRST) <= set(first)
    # the sit-out list is entirely OUTSIDE the window ...
    assert not (set(drv._ATTEST_LAST) & set(first))
    # ... and exactly accounts for every demoted twin (window + last = twins)
    twins = [n for n in names if n in o]
    assert set(twins) == set(first) | set(drv._ATTEST_LAST)
    assert len(drv._ATTEST_LAST) == len(twins) - WINDOW


def test_rows_only_queries_never_displace_twins():
    q, o = drv.queries(), drv.oracle_sql()
    names = list(q)
    first_untwinned = next(i for i, n in enumerate(names) if n not in o)
    # all twins come before any rows-only entry
    assert all(n not in o for n in names[first_untwinned:])


def test_oracle_and_queries_agree():
    q, o = drv.queries(), drv.oracle_sql()
    assert set(o) <= set(q)
    # oracle ordering mirrors queries() so the driver pairs them by position
    qt = [n for n in q if n in o]
    assert qt == list(o)
