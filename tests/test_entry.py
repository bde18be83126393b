"""The driver contract: __graft_entry__ must compile single-chip and run the
full sharded train step on a virtual multi-device mesh."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import __graft_entry__ as ge


def test_entry_forward_shape():
    fn, args = ge.entry()
    out = jax.eval_shape(jax.jit(fn), *args)
    assert out.shape == (1, 384, 1248, 2)


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)


def test_dryrun_multichip_2():
    ge.dryrun_multichip(2)
