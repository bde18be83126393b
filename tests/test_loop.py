"""Integration: BatchLoader -> train() loop -> checkpoint, on CPU."""

import jax
import numpy as np

from semanticsegmentation_tensorflow_tpu.data import (
    KittiRoadDataset, generate_synthetic_kitti, make_augment_fn,
)
from semanticsegmentation_tensorflow_tpu.data.pipeline import BatchLoader
from semanticsegmentation_tensorflow_tpu.models import build_model
from semanticsegmentation_tensorflow_tpu.train import (
    create_train_state, make_train_step,
)
from semanticsegmentation_tensorflow_tpu.train.checkpoint import CheckpointManager
from semanticsegmentation_tensorflow_tpu.train.loop import LoopHooks, train
from semanticsegmentation_tensorflow_tpu.train.state import make_optimizer


def test_train_loop_end_to_end(tmp_path):
    d = generate_synthetic_kitti(str(tmp_path / "dr"), n_train=4, n_test=0,
                                 h=64, w=96)
    ds = KittiRoadDataset(d, image_size=(64, 96))
    loader = BatchLoader(ds, batch_size=2, pad_multiple=16)

    model = build_model("unet", num_classes=2, base_features=8)
    state = create_train_state(model, jax.random.key(0), (2, 64, 96, 3),
                               make_optimizer("adam", 1e-3))
    aug = make_augment_fn((127.0,) * 3, (60.0,) * 3, crop_size=None)
    step = make_train_step(num_classes=2, augment_fn=aug)
    ckpt = CheckpointManager(str(tmp_path / "ck"))

    logged = []
    hooks = LoopHooks(on_log=lambda s, m: logged.append(s),
                      on_epoch=lambda e, s: None)
    state, summary = train(state, step, loader.epoch, epochs=3,
                           num_classes=2, log_every=1, checkpoint_every=2,
                           ckpt=ckpt, hooks=hooks)
    assert int(jax.device_get(state.step)) == 6  # 3 epochs x 2 steps
    assert logged == [1, 2, 3, 4, 5, 6]
    assert np.isfinite(summary["loss"])
    assert 0.0 <= float(summary["miou"]) <= 1.0
    assert summary["images_per_sec"] > 0
    assert ckpt.latest_step() == 6
    ckpt.close()


def test_loop_resume_from_checkpoint(tmp_path):
    d = generate_synthetic_kitti(str(tmp_path / "dr"), n_train=2, n_test=0,
                                 h=32, w=32)
    ds = KittiRoadDataset(d, image_size=(32, 32))
    loader = BatchLoader(ds, batch_size=2, pad_multiple=16)
    model = build_model("unet", num_classes=2, base_features=8)
    tx = make_optimizer("adam", 1e-3)
    state = create_train_state(model, jax.random.key(0), (2, 32, 32, 3), tx)
    step = make_train_step(num_classes=2)
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    state, _ = train(state, step, loader.epoch, epochs=2, num_classes=2,
                     log_every=0, ckpt=ckpt)
    # fresh process: restore and continue
    fresh = create_train_state(model, jax.random.key(9), (2, 32, 32, 3), tx)
    fresh = ckpt.restore(fresh)
    assert int(jax.device_get(fresh.step)) == 2
    fresh, _ = train(fresh, step, loader.epoch, epochs=1, num_classes=2,
                     log_every=0, ckpt=ckpt)
    assert int(jax.device_get(fresh.step)) == 3
    assert ckpt.latest_step() == 3
    ckpt.close()


def test_checkpoint_rng_restores_across_impl_change(tmp_path):
    """The rng is stored as key DATA + impl name, so a checkpoint written
    under one PRNG impl (e.g. the rbg default) restores exactly even when
    the restore template was built with a different impl — key shapes
    differ per impl (threefry2x32 uint32[2] vs rbg uint32[4]), and storing
    the typed key would couple checkpoints to the writer's impl."""
    import numpy as np

    import jax

    from semanticsegmentation_tensorflow_tpu.models import build_model
    from semanticsegmentation_tensorflow_tpu.train import create_train_state
    from semanticsegmentation_tensorflow_tpu.train.checkpoint import (
        CheckpointManager,
    )
    from semanticsegmentation_tensorflow_tpu.train.state import make_optimizer

    model = build_model("unet", num_classes=2, base_features=4)
    st = create_train_state(model, jax.random.key(0), (1, 32, 32, 3),
                            make_optimizer("adam", 1e-4))
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(st, wait=True)
    other_impl = ("threefry2x32"
                  if str(jax.random.key_impl(st.rng)) != "threefry2x32"
                  else "rbg")
    template = st.replace(rng=jax.random.key(7, impl=other_impl))
    restored = mgr.restore(template)
    mgr.close()
    assert (str(jax.random.key_impl(restored.rng))
            == str(jax.random.key_impl(st.rng)))
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(restored.rng)),
        np.asarray(jax.random.key_data(st.rng)))


def test_checkpoint_restore_into_abstract_template(tmp_path):
    """scripts/test.py restores into a create_abstract_state template
    (ShapeDtypeStruct leaves, including the rng) — the rng data+impl
    handling must not require a concrete key."""
    import jax

    from semanticsegmentation_tensorflow_tpu.models import build_model
    from semanticsegmentation_tensorflow_tpu.train import create_train_state
    from semanticsegmentation_tensorflow_tpu.train.checkpoint import (
        CheckpointManager,
    )
    from semanticsegmentation_tensorflow_tpu.train.state import (
        create_abstract_state, make_optimizer,
    )

    model = build_model("unet", num_classes=2, base_features=4)
    tx = make_optimizer("adam", 1e-4)
    st = create_train_state(model, jax.random.key(0), (1, 32, 32, 3), tx)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(st, wait=True)
    abstract = create_abstract_state(model, (1, 32, 32, 3), tx)
    restored = mgr.restore(abstract)
    mgr.close()
    assert (str(jax.random.key_impl(restored.rng))
            == str(jax.random.key_impl(st.rng)))


def test_loop_with_metrics_free_step(tmp_path):
    """train() must work with make_train_step(with_metrics=False) — the
    step then emits no confusion matrix (bench.py's configuration), and the
    loop accumulates the loss alone instead of KeyError-ing on out['cm']."""
    d = generate_synthetic_kitti(str(tmp_path / "dr"), n_train=2, n_test=0,
                                 h=32, w=32)
    ds = KittiRoadDataset(d, image_size=(32, 32))
    loader = BatchLoader(ds, batch_size=2, pad_multiple=16)
    model = build_model("unet", num_classes=2, base_features=8)
    state = create_train_state(model, jax.random.key(0), (2, 32, 32, 3),
                               make_optimizer("adam", 1e-3))
    step = make_train_step(num_classes=2, with_metrics=False)
    state, summary = train(state, step, loader.epoch, epochs=2,
                           num_classes=2, log_every=0)
    assert int(jax.device_get(state.step)) == 2
    assert np.isfinite(summary["loss"])
    assert float(summary["miou"]) == 0.0  # no cm accumulated


def test_checkpoint_abstract_threefry_template_without_metadata(tmp_path):
    """ADVICE r2: with item_metadata unavailable, restoring an abstract
    template whose rng is a threefry key must resolve the impl from the
    key dtype TAG ('key<fry>') to the real impl name instead of raising
    'unrecognized PRNG implementation'."""
    import jax

    from semanticsegmentation_tensorflow_tpu.models import build_model
    from semanticsegmentation_tensorflow_tpu.train import create_train_state
    from semanticsegmentation_tensorflow_tpu.train.checkpoint import (
        CheckpointManager,
    )
    from semanticsegmentation_tensorflow_tpu.train.state import make_optimizer

    model = build_model("unet", num_classes=2, base_features=4)
    tx = make_optimizer("adam", 1e-4)
    st = create_train_state(model, jax.random.key(0), (1, 32, 32, 3), tx)
    st = st.replace(rng=jax.random.key(3, impl="threefry2x32"))
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(st, wait=True)

    def broken_metadata(step):
        raise RuntimeError("metadata unavailable")

    mgr._mgr.item_metadata = broken_metadata  # force the fallback branch
    abstract_rng = jax.eval_shape(
        lambda: jax.random.key(0, impl="threefry2x32"))
    template = st.replace(rng=abstract_rng)
    restored = mgr.restore(template)
    mgr.close()
    assert str(jax.random.key_impl(restored.rng)) == "threefry2x32"
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(restored.rng)),
        np.asarray(jax.random.key_data(st.rng)))


def test_mesh_loop_checkpoint_resume(tmp_path):
    """Distributed checkpoint/resume (round 4): train under the 1-D data
    mesh, checkpoint the replicated state, restore into a FRESH replicated
    state, continue under the mesh — params equal an uninterrupted mesh
    run bit-for-bit (the state is replicated, so orbax saves/restores one
    logical copy; sharding comes back from the restore template)."""
    from semanticsegmentation_tensorflow_tpu.parallel import (
        make_mesh, replicate, shard_batch,
    )

    d = generate_synthetic_kitti(str(tmp_path / "dr"), n_train=8, n_test=0,
                                 h=32, w=32)
    ds = KittiRoadDataset(d, image_size=(32, 32))
    mesh = make_mesh()
    model = build_model("unet", num_classes=2, base_features=8)
    tx = make_optimizer("sgd", 1e-3)
    step = make_train_step(num_classes=2, mesh=mesh)

    def loader():
        return BatchLoader(ds, batch_size=8, pad_multiple=16, seed=7,
                           mesh=mesh)

    # uninterrupted: 2 epochs (2 steps)
    sa = create_train_state(model, jax.random.key(0), (8, 32, 32, 3), tx)
    sa = replicate(sa, mesh)
    sa, _ = train(sa, step, loader().epoch, epochs=2, num_classes=2,
                  log_every=0)

    # interrupted: 1 epoch -> checkpoint -> fresh restore -> 1 epoch
    sb = create_train_state(model, jax.random.key(0), (8, 32, 32, 3), tx)
    sb = replicate(sb, mesh)
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    sb, _ = train(sb, step, loader().epoch, epochs=1, num_classes=2,
                  log_every=0, ckpt=ckpt)
    fresh = create_train_state(model, jax.random.key(5), (8, 32, 32, 3), tx)
    fresh = replicate(fresh, mesh)
    fresh = ckpt.restore(fresh)
    assert int(jax.device_get(fresh.step)) == 1
    # the loader is rebuilt with the same seed, so epoch 2's batches match
    # the uninterrupted run's second epoch only if each epoch reshuffles
    # identically from the constructor seed — rebuild, then skip epoch 1
    lo = loader()
    next(iter(lo.epoch()))  # consume epoch-1's single batch
    fresh, _ = train(fresh, step, lo.epoch, epochs=1, num_classes=2,
                     log_every=0, ckpt=ckpt)
    assert int(jax.device_get(fresh.step)) == 2
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(fresh.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ckpt.close()


def test_val_fn_and_keep_best(tmp_path):
    """val_fn runs on the cadence, its metrics land in the summary, and
    best_ckpt saves exactly on improvements."""
    d = generate_synthetic_kitti(str(tmp_path / "dv"), n_train=4, n_test=0,
                                 h=64, w=96)
    ds = KittiRoadDataset(d, image_size=(64, 96))
    loader = BatchLoader(ds, batch_size=2, pad_multiple=16)
    model = build_model("unet", num_classes=2, base_features=8)
    state = create_train_state(model, jax.random.key(0), (2, 64, 96, 3),
                               make_optimizer("adam", 1e-3))
    aug = make_augment_fn((127.0,) * 3, (60.0,) * 3, crop_size=None)
    step = make_train_step(num_classes=2, augment_fn=aug)

    mious = iter([0.3, 0.2, 0.5, 0.5])  # improve, worse, improve, flat
    calls = []

    def val_fn(state):
        m = next(mious)
        calls.append(m)
        return {"val_loss": 1.0 - m, "val_miou": m}

    class FakeBest:
        saved = []

        def save(self, state, wait=False):
            self.saved.append(int(jax.device_get(state.step)))

    best = FakeBest()
    state, summary = train(state, step, loader.epoch, epochs=4,
                           num_classes=2, log_every=0, val_every=1,
                           val_fn=val_fn, best_ckpt=best)
    assert calls == [0.3, 0.2, 0.5, 0.5]
    assert best.saved == [2, 6]  # epochs 1 and 3 (improvements only)
    assert summary["val_miou"] == 0.5
    assert "val_loss" in summary


def test_val_every_cadence(tmp_path):
    d = generate_synthetic_kitti(str(tmp_path / "dv2"), n_train=4, n_test=0,
                                 h=64, w=96)
    ds = KittiRoadDataset(d, image_size=(64, 96))
    loader = BatchLoader(ds, batch_size=2, pad_multiple=16)
    model = build_model("unet", num_classes=2, base_features=8)
    state = create_train_state(model, jax.random.key(0), (2, 64, 96, 3),
                               make_optimizer("adam", 1e-3))
    step = make_train_step(num_classes=2)
    n = [0]
    state, _ = train(state, step, loader.epoch, epochs=4, num_classes=2,
                     log_every=0, val_every=2,
                     val_fn=lambda s: (n.__setitem__(0, n[0] + 1)
                                       or {"val_miou": 0.0}))
    assert n[0] == 2  # epochs 2 and 4
