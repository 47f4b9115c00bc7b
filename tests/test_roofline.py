"""Roofline measurement helpers (tpu_spai/bench/roofline.py).

The co-phased bracket (round-5): each SpMV timing is bracketed by two
STREAM measurements; a >15% disagreement means the worker phase flipped
inside the window and the window slides. Pure-logic tests — the on-chip
path is exercised by bench.py itself.
"""

from tpu_spai.bench.roofline import bracketed_measure


class _Seq:
    def __init__(self, vals):
        self.vals = list(vals)
        self.calls = 0

    def __call__(self):
        self.calls += 1
        return self.vals.pop(0)


def test_bracket_stable_phase_no_slide():
    stream = _Seq([700.0, 690.0])
    timer = _Seq([1.0])
    t, s_pre, s_post, flipped = bracketed_measure(timer, stream)
    assert (t, s_pre, s_post) == (1.0, 700.0, 690.0)
    assert not flipped
    assert timer.calls == 1 and stream.calls == 2


def test_bracket_slides_on_phase_flip():
    # pre=200 (slow phase), post=700 (flipped mid-window) -> slide;
    # second window 700/690 agrees -> the RE-TIMED kernel value is used
    stream = _Seq([200.0, 700.0, 690.0])
    timer = _Seq([9.0, 1.0])
    t, s_pre, s_post, flipped = bracketed_measure(timer, stream)
    assert t == 1.0  # re-timed adjacent to the agreeing bracket
    assert (s_pre, s_post) == (700.0, 690.0)
    assert not flipped
    assert timer.calls == 2


def test_bracket_flags_unresolved_flip():
    # phase thrashes through every slide -> flagged, never silently ok
    stream = _Seq([200.0, 700.0, 200.0, 700.0])
    timer = _Seq([9.0, 8.0, 7.0])
    t, s_pre, s_post, flipped = bracketed_measure(timer, stream)
    assert flipped
    assert timer.calls == 3  # initial + max_slides re-times
