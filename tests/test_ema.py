"""EMA param tracking (train/state.py): update recurrence, eval_params
selection, checkpoint round-trip, and template/checkpoint mismatch guard."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.models import build_model
from semanticsegmentation_tensorflow_tpu.train import (
    create_train_state, make_train_step,
)
from semanticsegmentation_tensorflow_tpu.train.checkpoint import (
    CheckpointManager,
)
from semanticsegmentation_tensorflow_tpu.train.state import (
    create_abstract_state, make_optimizer,
)
from semanticsegmentation_tensorflow_tpu.data import synthetic_batch


def _state(ema_decay=0.0, seed=0):
    model = build_model("unet", num_classes=2, base_features=8,
                        dtype=jnp.float32)
    return create_train_state(model, jax.random.key(seed), (4, 32, 32, 3),
                              make_optimizer("sgd", 1e-2),
                              ema_decay=ema_decay)


def _batch(n=4, seed=0):
    return {k: jnp.asarray(v)
            for k, v in synthetic_batch(n, 32, 32, seed=seed).items()}


def test_ema_recurrence_matches_manual():
    d = 0.9
    sa = _state(ema_decay=d)
    sb = _state(ema_decay=0.0)
    manual = jax.tree.map(jnp.copy, sb.params)  # init ema == init params
    step_a = make_train_step(num_classes=2)
    step_b = make_train_step(num_classes=2)
    batch = _batch()
    for _ in range(3):
        sa, _ = step_a(sa, batch)
        sb, _ = step_b(sb, batch)
        manual = jax.tree.map(lambda e, p: e * d + p * (1 - d),
                              manual, sb.params)
    # raw params evolve identically with or without tracking...
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # ...and the tracked EMA equals the hand recurrence
    for a, m in zip(jax.tree.leaves(sa.ema_params), jax.tree.leaves(manual)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(m),
                                   rtol=1e-6, atol=1e-7)
    # EMA lags the raw params (they moved; decay holds history)
    diffs = [float(jnp.abs(a - p).max()) for a, p in
             zip(jax.tree.leaves(sa.ema_params), jax.tree.leaves(sa.params))]
    assert max(diffs) > 0


def test_eval_params_selection():
    s = _state(ema_decay=0.99)
    assert s.eval_params(True) is s.ema_params
    assert s.eval_params(False) is s.params
    s0 = _state(ema_decay=0.0)
    assert s0.eval_params(True) is s0.params  # nothing tracked -> raw


def test_ema_checkpoint_roundtrip(tmp_path):
    s = _state(ema_decay=0.9)
    step = make_train_step(num_classes=2)
    s, _ = step(s, _batch())
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(s, wait=True)
    mgr.close()

    model = build_model("unet", num_classes=2, base_features=8,
                        dtype=jnp.float32)
    tmpl = create_abstract_state(model, (4, 32, 32, 3),
                                 make_optimizer("sgd", 1e-2), ema=True)
    mgr2 = CheckpointManager(str(tmp_path))
    r = mgr2.restore(tmpl)
    mgr2.close()
    for a, b in zip(jax.tree.leaves(s.ema_params),
                    jax.tree.leaves(r.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_ema_from_plain_checkpoint_raises(tmp_path):
    s = _state(ema_decay=0.0)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(s, wait=True)
    mgr.close()
    model = build_model("unet", num_classes=2, base_features=8,
                        dtype=jnp.float32)
    tmpl = create_abstract_state(model, (4, 32, 32, 3),
                                 make_optimizer("sgd", 1e-2), ema=True)
    mgr2 = CheckpointManager(str(tmp_path))
    with pytest.raises(ValueError, match="not .*trained with --ema-decay"):
        mgr2.restore(tmpl)
    mgr2.close()


def test_restore_ema_checkpoint_into_plain_template(tmp_path):
    """The everyday serving case: a checkpoint trained WITH --ema-decay
    evaluated WITHOUT --ema. The extra on-disk ema_params entry must be
    restored-and-dropped (regression: orbax StandardRestore demands
    structural equality and raised a tree-mismatch dump)."""
    s = _state(ema_decay=0.9)
    step = make_train_step(num_classes=2)
    s, _ = step(s, _batch())
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(s, wait=True)
    mgr.close()

    model = build_model("unet", num_classes=2, base_features=8,
                        dtype=jnp.float32)
    tmpl = create_abstract_state(model, (4, 32, 32, 3),
                                 make_optimizer("sgd", 1e-2), ema=False)
    mgr2 = CheckpointManager(str(tmp_path))
    r = mgr2.restore(tmpl)
    mgr2.close()
    assert not jax.tree.leaves(r.ema_params)  # ignored, not leaked
    for a, b in zip(jax.tree.leaves(s.params), jax.tree.leaves(r.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(r.step) == int(s.step)


def test_restore_warns_when_resume_drops_ema(tmp_path):
    """train.py --resume without --ema-decay on an EMA checkpoint: the
    tracking silently stops, so restore(warn_dropped=True) must say so
    (found live in the round-5 drive — the QAT resume epoch dropped the
    EMA tree and a later eval --ema failed on the re-saved checkpoint)."""
    s = _state(ema_decay=0.9)
    step = make_train_step(num_classes=2)
    s, _ = step(s, _batch())
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(s, wait=True)
    mgr.close()

    model = build_model("unet", num_classes=2, base_features=8,
                        dtype=jnp.float32)
    tmpl = create_abstract_state(model, (4, 32, 32, 3),
                                 make_optimizer("sgd", 1e-2), ema=False)
    mgr2 = CheckpointManager(str(tmp_path))
    with pytest.warns(UserWarning, match="EMA tracking stops"):
        mgr2.restore(tmpl, warn_dropped=True)
    mgr2.close()
    # and the eval path (warn_dropped default False) stays silent
    mgr3 = CheckpointManager(str(tmp_path))
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")
        mgr3.restore(tmpl)
    mgr3.close()


def test_plain_checkpoint_roundtrip_unchanged(tmp_path):
    """Non-EMA checkpoints keep their exact pre-EMA layout (regression:
    the payload gains the ema_params key ONLY when tracked)."""
    s = _state(ema_decay=0.0)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(s, wait=True)
    assert "ema_params" not in set(
        mgr._mgr.item_metadata(mgr.latest_step()).keys())
    mgr.close()
