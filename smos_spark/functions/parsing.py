"""CLI/driver-side parsing helpers (SURVEY §2 F1/F2).

Reference twins:
  * str2bool — /root/reference/src/smos/reshuffle.py:77-81 (whitelist
    of truthy strings; everything else is False)
  * mkdate — /root/reference/src/smos/reshuffle.py:60-75 (two-format
    date parse: '%Y-%m-%d' and '%Y-%m-%dT%H:%M')

These are argparse `type=` callables for the engine's CLIs; the
Column-side equivalents (flag predicates, two-format timestamp parse)
live in operators/masking.py where they run as Catalyst expressions.
"""

from __future__ import annotations

import datetime as dt

__all__ = ["str2bool", "mkdate"]

_TRUTHY = frozenset(["True", "true", "t", "T", "1"])


def str2bool(val: str) -> bool:
    """Whitelist string→bool: exactly the reference's semantics —
    'True'/'true'/'t'/'T'/'1' are True, anything else (including
    'yes') is False."""
    return val in _TRUTHY


def mkdate(datestring: str) -> dt.datetime:
    """Two-format date parse: 'YYYY-MM-DD' or 'YYYY-MM-DDTHH:MM'.
    Raises ValueError on anything else (the reference silently returns
    None; argparse needs the raise to report the bad flag)."""
    if len(datestring) == 10:
        return dt.datetime.strptime(datestring, "%Y-%m-%d")
    if len(datestring) == 16:
        return dt.datetime.strptime(datestring, "%Y-%m-%dT%H:%M")
    raise ValueError(f"not a 'YYYY-MM-DD' or 'YYYY-MM-DDTHH:MM' date: {datestring!r}")
