"""Unit tests for the double-buffered dispatch helper used by CLI eval loops.

Replaces the reference drivers' per-batch-synced eval loops
(ref: AVMOE/AVE/main_trans_v3.py:349-354) with `depth` dispatches in flight.
"""

from avmoe_tpu.utils import pipelined


def test_pipelined_pairs_and_order():
    items = list(range(7))
    calls = []

    def fn(x):
        calls.append(x)
        return x * 2

    out = list(pipelined(fn, items, depth=2))
    assert out == [(i, 2 * i) for i in items]
    assert calls == items  # every item dispatched exactly once, in order


def test_pipelined_keeps_depth_in_flight():
    calls = []

    def fn(x):
        calls.append(x)
        return x

    gen = pipelined(fn, range(10), depth=2)
    first = next(gen)
    # by the time item 0 is yielded, items 0..2 have been dispatched
    # (queue only yields once its length exceeds depth)
    assert first == (0, 0)
    assert calls == [0, 1, 2]
    rest = list(gen)
    assert [b for b, _ in rest] == list(range(1, 10))


def test_pipelined_short_iterable_drains():
    # fewer items than depth: everything still comes out
    out = list(pipelined(lambda x: -x, [1, 2], depth=3))
    assert out == [(1, -1), (2, -2)]
