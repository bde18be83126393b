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
    # hermeticity contract: the dryrun must never place data on a non-CPU
    # device when the mesh lives on (fake) CPU devices — validated for real
    # with the axon TPU plugin present (round 2). jax.live_arrays() is
    # process-global, so snapshot before and only inspect arrays the dryrun
    # itself created (earlier test modules may legitimately hold arrays on
    # the default backend).
    before = {id(a) for a in jax.live_arrays()}
    ge.dryrun_multichip(8)
    created = [a for a in jax.live_arrays() if id(a) not in before]
    assert not [a for a in created
                if any(d.platform != "cpu" for d in a.devices())]


def test_dryrun_multichip_2():
    ge.dryrun_multichip(2)
