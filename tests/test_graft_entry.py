"""Driver-contract sanity: entry() must stay jittable with stable shapes
(cheap abstract trace — the driver does the real compile on hardware)."""

import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_traces():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    loss_shape, A_shape = out
    assert loss_shape.shape == ()
    assert A_shape.shape == (8, 19, 50, 50)  # (B, T-1, N, N)
