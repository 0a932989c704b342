"""Small pure-python helpers.

Capability parity with the helper block of the reference implementation
(reference: gigagan_pytorch/gigagan_pytorch.py:40-113), re-expressed for a JAX
codebase.  Anything tensor-shaped lives in `gigagan_tpu.ops` instead.
"""

from __future__ import annotations

from math import log2
from typing import Iterable, Sequence


def exists(val):
    return val is not None


def default(*vals):
    for val in vals:
        if exists(val):
            return val
    return None


def cast_tuple(t, length: int = 1):
    return t if isinstance(t, tuple) else ((t,) * length)


def divisible_by(numer: int, denom: int) -> bool:
    return (numer % denom) == 0


def is_power_of_two(n) -> bool:
    return log2(n).is_integer()


def is_unique(arr: Sequence) -> bool:
    return len(set(arr)) == len(arr)


def num_to_groups(num: int, divisor: int):
    groups, remainder = divmod(num, divisor)
    arr = [divisor] * groups
    if remainder > 0:
        arr.append(remainder)
    return arr


def cycle(iterable: Iterable):
    while True:
        for data in iterable:
            yield data


class ModTable:
    """Indexed access into the style→modulation projection.

    The reference threads a python iterator over `tensor.split(split_dims)`
    through every layer and asserts exhaustion at the end
    (reference: gigagan_pytorch/gigagan_pytorch.py:1184-1186,1245).  Under
    `jit` we instead pre-split into an explicit table; consumption is tracked
    at trace time, so the exhaustion check is a *compile-time* invariant
    rather than a runtime one.
    """

    def __init__(self, mods, split_dims: Sequence[int]):
        # mods: (batch, sum(split_dims)) array
        assert mods.shape[-1] == sum(split_dims), (
            f"modulation vector has dim {mods.shape[-1]} but layers expect "
            f"{sum(split_dims)}"
        )
        self._entries = []
        offset = 0
        for dim in split_dims:
            self._entries.append(mods[..., offset : offset + dim])
            offset += dim
        self._cursor = 0

    def next(self):
        assert self._cursor < len(self._entries), "modulation table exhausted"
        entry = self._entries[self._cursor]
        self._cursor += 1
        # zero-width entries stand in for "no kernel selection" slots
        return entry if entry.shape[-1] > 0 else None

    def assert_exhausted(self):
        assert self._cursor == len(self._entries), (
            f"convolutions were incorrectly modulated: consumed "
            f"{self._cursor}/{len(self._entries)} modulation slots"
        )

    def skip(self, n: int):
        self._cursor += n
        assert self._cursor <= len(self._entries)
