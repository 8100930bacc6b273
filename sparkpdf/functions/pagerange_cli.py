"""CLI-style (filename, page-range) argument pairing — SURVEY §2.3 P12.

Parity: parse_filename_page_ranges (/root/reference/pagerange.py:129-156):
a filename may be followed by zero or more range expressions; a filename
with no range means all pages. Ranges use the python-slice syntax of
kernels/geometry.parse_page_range.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from ..kernels.geometry import parse_page_range

PAGE_RANGE_ALL = slice(None, None, None)


def is_valid_range(arg) -> bool:
    if isinstance(arg, slice):
        return True
    if not isinstance(arg, str):
        return False
    try:
        parse_page_range(arg)
        return True
    except ValueError:
        return False


def parse_filename_page_ranges(args: List[Optional[str]]) -> List[Tuple[str, slice]]:
    pairs: List[Tuple[str, slice]] = []
    filename: Optional[str] = None
    did_range = False
    for arg in list(args) + [None]:
        if arg is not None and is_valid_range(arg):
            if not filename:
                raise ValueError(
                    "The first argument must be a filename, not a page range."
                )
            rng = arg if isinstance(arg, slice) else parse_page_range(arg)
            pairs.append((filename, rng))
            did_range = True
        else:
            if filename and not did_range:
                pairs.append((filename, PAGE_RANGE_ALL))
            filename = arg
            did_range = False
    return pairs
