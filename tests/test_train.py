import numpy as np

import jax
import jax.numpy as jnp
import pytest

from semanticsegmentation_tensorflow_tpu.data import make_augment_fn, synthetic_batch
from semanticsegmentation_tensorflow_tpu.models import build_model
from semanticsegmentation_tensorflow_tpu.parallel import make_mesh, shard_batch, replicate
from semanticsegmentation_tensorflow_tpu.train import (
    create_train_state, make_train_step, make_eval_step,
)
from semanticsegmentation_tensorflow_tpu.train.state import make_optimizer


def _tiny_state(name="unet", num_classes=2, shape=(4, 32, 32, 3), lr=1e-3,
                seed=0, opt="adam", **kw):
    model = build_model(name, num_classes=num_classes,
                        **(kw or dict(base_features=8)))
    tx = make_optimizer(opt, lr)
    return create_train_state(model, jax.random.key(seed), shape, tx)


def _batch(n=4, h=32, w=32, seed=0):
    b = synthetic_batch(n, h, w, seed=seed)
    return {k: jnp.asarray(v) for k, v in b.items()}


class TestSingleDevice:
    def test_step_runs_and_updates(self):
        state = _tiny_state(base_features=8)
        step = make_train_step(num_classes=2)
        batch = _batch()
        p0 = jax.tree.map(lambda x: x.copy(), state.params)
        state, out = step(state, batch)
        assert int(state.step) == 1
        assert np.isfinite(float(out["loss"]))
        assert out["cm"].shape == (2, 2)
        diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), p0,
                             state.params)
        assert max(jax.tree.leaves(diffs)) > 0

    def test_overfit_tiny_batch(self):
        """Convergence gate (SURVEY.md §4): loss -> small on a fixed batch."""
        state = _tiny_state(base_features=8, lr=3e-3)
        step = make_train_step(num_classes=2)
        batch = _batch()
        first = None
        for _ in range(75):
            state, out = step(state, batch)
            if first is None:
                first = float(out["loss"])
        last = float(out["loss"])
        assert last < first * 0.2, (first, last)
        assert last < 0.25

    def test_lr_schedule_values(self):
        from semanticsegmentation_tensorflow_tpu.train.state import (
            make_lr_schedule,
        )

        # constant without warmup stays a plain float (no schedule ops in
        # the jaxpr — the reference's constant-LR behavior, exactly)
        assert make_lr_schedule(1e-3) == 1e-3
        # evaluate UNDER JIT: optax's own polynomial_schedule is NaN at
        # count == transition_steps when compiled (XLA pow(0, 0.9) -> NaN;
        # eager gives 0) — the reason make_lr_schedule rolls its own poly.
        s = jax.jit(make_lr_schedule(1.0, "poly", total_steps=100,
                                     warmup_steps=10))
        np.testing.assert_allclose(float(s(0)), 0.0, atol=1e-9)
        np.testing.assert_allclose(float(s(10)), 1.0, rtol=1e-6)
        np.testing.assert_allclose(float(s(100)), 0.0, atol=1e-7)
        np.testing.assert_allclose(float(s(1000)), 0.0, atol=1e-7)
        assert 0.3 < float(s(55)) < 0.7
        c = jax.jit(make_lr_schedule(2.0, "cosine", total_steps=50))
        np.testing.assert_allclose(float(c(0)), 2.0, rtol=1e-6)
        np.testing.assert_allclose(float(c(50)), 0.0, atol=1e-7)
        with pytest.raises(ValueError):
            make_lr_schedule(1.0, "poly")           # needs total_steps
        with pytest.raises(ValueError):
            make_lr_schedule(1.0, "nope", total_steps=5)

    def test_scheduled_optimizer_decays_to_zero_update(self):
        """make_optimizer(schedule='poly', total_steps=N): after N steps
        the LR has decayed to 0 and further steps leave params unchanged
        (sgd: update = -lr * momentum, exactly zero at lr 0)."""
        model = build_model("unet", num_classes=2, base_features=8)
        tx = make_optimizer("sgd", 1e-2, schedule="poly", total_steps=3)
        state = create_train_state(model, jax.random.key(0), (4, 32, 32, 3),
                                   tx)
        step = make_train_step(num_classes=2)
        batch = _batch()
        p0 = jax.tree.map(lambda x: x.copy(), state.params)
        for _ in range(3):
            state, _ = step(state, batch)
        p3 = jax.tree.map(lambda x: x.copy(), state.params)
        moved = max(jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), p0, p3)))
        assert moved > 0
        state, _ = step(state, batch)  # 4th step: lr == 0
        frozen = max(jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), p3, state.params)))
        assert frozen == 0.0

    def test_class_weighted_step_trains(self):
        """class_weights plumbs through make_train_step; all-ones weights
        give the bit-identical loss to the unweighted step."""
        batch = _batch()
        s1 = _tiny_state(base_features=8)
        s2 = _tiny_state(base_features=8)
        plain = make_train_step(num_classes=2)
        ones = make_train_step(num_classes=2,
                               class_weights=jnp.ones(2, jnp.float32))
        s1, o1 = plain(s1, batch)
        s2, o2 = ones(s2, batch)
        assert float(o1["loss"]) == float(o2["loss"])
        skewed = make_train_step(num_classes=2,
                                 class_weights=jnp.asarray([2.0, 0.5]))
        s3 = _tiny_state(base_features=8)
        s3, o3 = skewed(s3, batch)
        assert np.isfinite(float(o3["loss"]))
        assert float(o3["loss"]) != float(o1["loss"])

    def test_bf16_first_moment_adam_converges(self):
        """mu_dtype='bfloat16' (make_optimizer's weight-heavy-config perf
        knob, A/B'd via BENCH_OPT_KWARGS / bench_flags --opt): the first
        moment is actually stored in bf16, and the overfit gate still
        passes — the knob may trade a little precision, never convergence."""
        model = build_model("unet", num_classes=2, base_features=8)
        tx = make_optimizer("adam", 3e-3, mu_dtype="bfloat16")
        state = create_train_state(model, jax.random.key(0), (4, 32, 32, 3),
                                   tx)
        step = make_train_step(num_classes=2)
        batch = _batch()
        state, out = step(state, batch)
        first = float(out["loss"])
        mu = state.opt_state[0].mu
        assert all(x.dtype == jnp.bfloat16 for x in jax.tree.leaves(mu))
        for _ in range(74):
            state, out = step(state, batch)
        last = float(out["loss"])
        assert last < first * 0.2, (first, last)
        assert last < 0.25

    def test_augment_fused_into_step(self):
        aug = make_augment_fn((127.5, 127.5, 127.5), (58.0, 58.0, 58.0),
                              crop_size=(16, 16))
        state = _tiny_state(shape=(4, 16, 16, 3), base_features=8)
        step = make_train_step(num_classes=2, augment_fn=aug)
        b = synthetic_batch(4, 32, 32)
        batch = {"image": jnp.asarray((b["image"] * 58.0 + 127.5).astype(np.uint8)),
                 "label": jnp.asarray(b["label"]),
                 "valid": jnp.asarray(b["valid"])}
        state, out = step(state, batch)
        assert np.isfinite(float(out["loss"]))

    def test_bn_model_updates_batch_stats(self):
        state = _tiny_state(name="segnet", shape=(2, 32, 32, 3),
                            width_mult=0.125, use_bn=True)
        assert jax.tree.leaves(state.batch_stats)
        s0 = jax.tree.map(lambda x: x.copy(), state.batch_stats)
        step = make_train_step(num_classes=2)
        state, _ = step(state, _batch(2))
        diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), s0,
                             state.batch_stats)
        assert max(jax.tree.leaves(diffs)) > 0


class TestDistributed:
    """Multi-chip data parallelism on 8 fake CPU devices (conftest)."""

    def test_mesh_has_8_devices(self):
        mesh = make_mesh()
        assert mesh.devices.size == 8

    def test_sharded_matches_single_device_grads(self):
        """One sharded step == one single-device step on the global batch.

        SGD so the param delta is linear in the gradient (Adam's first-step
        m/sqrt(v) is a sign function — it amplifies reduction-order noise on
        near-zero grads beyond any sensible tolerance).
        """
        mesh = make_mesh()
        batch = _batch(8)

        state_a = _tiny_state(base_features=8, seed=0, shape=(8, 32, 32, 3),
                              opt="sgd", dtype=jnp.float32)
        step_a = make_train_step(num_classes=2)
        state_a, out_a = step_a(state_a, batch)

        state_b = _tiny_state(base_features=8, seed=0, shape=(8, 32, 32, 3),
                              opt="sgd", dtype=jnp.float32)
        state_b = replicate(state_b, mesh)
        step_b = make_train_step(num_classes=2, mesh=mesh)
        state_b, out_b = step_b(state_b, shard_batch(batch, mesh))

        np.testing.assert_allclose(float(out_a["loss"]), float(out_b["loss"]),
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(out_a["cm"]),
                                      np.asarray(out_b["cm"]))
        a_leaves = jax.tree.leaves(state_a.params)
        b_leaves = jax.tree.leaves(state_b.params)
        for a, b in zip(a_leaves, b_leaves):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-6)

    def test_sharded_eval_step(self):
        mesh = make_mesh()
        state = replicate(_tiny_state(base_features=8, shape=(8, 32, 32, 3)),
                          mesh)
        ev = make_eval_step(num_classes=2, mesh=mesh)
        out = ev(state, shard_batch(_batch(8), mesh))
        assert out["pred"].shape == (8, 32, 32)
        assert int(out["cm"].sum()) == 8 * 32 * 32

    def test_multi_step_convergence_sharded(self):
        mesh = make_mesh()
        state = replicate(_tiny_state(base_features=8, lr=3e-3,
                                      shape=(8, 32, 32, 3)), mesh)
        step = make_train_step(num_classes=2, mesh=mesh)
        batch = shard_batch(_batch(8), mesh)
        losses = []
        for _ in range(30):
            state, out = step(state, batch)
            losses.append(float(out["loss"]))
        assert losses[-1] < losses[0] * 0.5


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from semanticsegmentation_tensorflow_tpu.train.checkpoint import (
            CheckpointManager,
        )
        state = _tiny_state(base_features=8)
        step = make_train_step(num_classes=2)
        state, _ = step(state, _batch())
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(state, wait=True)
        fresh = _tiny_state(base_features=8, seed=42)
        restored = mgr.restore(fresh)
        assert int(restored.step) == int(state.step) == 1
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        mgr.close()

    def test_restore_noop_when_empty(self, tmp_path):
        from semanticsegmentation_tensorflow_tpu.train.checkpoint import (
            CheckpointManager,
        )
        mgr = CheckpointManager(str(tmp_path / "empty"))
        state = _tiny_state(base_features=8)
        assert mgr.restore(state) is state
        mgr.close()


class TestAbstractState:
    def test_abstract_restore_roundtrip(self, tmp_path):
        from semanticsegmentation_tensorflow_tpu.train.checkpoint import (
            CheckpointManager,
        )
        from semanticsegmentation_tensorflow_tpu.train.state import (
            create_abstract_state,
        )
        from semanticsegmentation_tensorflow_tpu.models import build_model

        state = _tiny_state(base_features=8)
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(state, wait=True)

        model = build_model("unet", num_classes=2, base_features=8)
        tmpl = create_abstract_state(model, (4, 32, 32, 3),
                                     make_optimizer("adam", 1e-3))
        restored = mgr.restore(tmpl)
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        mgr.close()

    def test_abstract_restore_without_checkpoint_raises(self, tmp_path):
        from semanticsegmentation_tensorflow_tpu.train.checkpoint import (
            CheckpointManager,
        )
        from semanticsegmentation_tensorflow_tpu.train.state import (
            create_abstract_state,
        )
        from semanticsegmentation_tensorflow_tpu.models import build_model

        model = build_model("unet", num_classes=2, base_features=8)
        tmpl = create_abstract_state(model, (1, 32, 32, 3),
                                     make_optimizer("adam", 1e-3))
        mgr = CheckpointManager(str(tmp_path / "empty"))
        with pytest.raises(FileNotFoundError):
            mgr.restore(tmpl)
        mgr.close()


class TestSpatialPartitioning:
    """2-D data x spatial mesh: image rows sharded across chips, XLA inserts
    conv halo exchanges (SURVEY.md §5 spatial-partitioning stretch)."""

    def test_spatial_sharded_matches_single_device(self):
        from semanticsegmentation_tensorflow_tpu.parallel import make_mesh_2d
        mesh = make_mesh_2d(2, 4)
        batch = _batch(4, h=64, w=32)

        sa = _tiny_state(base_features=8, seed=0, shape=(4, 64, 32, 3),
                         opt="sgd", dtype=jnp.float32)
        step_a = make_train_step(num_classes=2)
        sa, out_a = step_a(sa, batch)

        sb = _tiny_state(base_features=8, seed=0, shape=(4, 64, 32, 3),
                         opt="sgd", dtype=jnp.float32)
        sb = replicate(sb, mesh)
        step_b = make_train_step(num_classes=2, mesh=mesh)
        sb, out_b = step_b(sb, shard_batch(batch, mesh))

        np.testing.assert_allclose(float(out_a["loss"]), float(out_b["loss"]),
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(out_a["cm"]),
                                      np.asarray(out_b["cm"]))
        for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-6)

    def test_spatial_mesh_batch_spec(self):
        from semanticsegmentation_tensorflow_tpu.parallel import (
            make_mesh_2d, batch_spec,
        )
        from jax.sharding import PartitionSpec as P
        mesh = make_mesh_2d(4, 2)
        assert batch_spec(mesh) == P("data", "spatial")
        b = shard_batch(_batch(4, h=32, w=32), mesh)
        assert b["image"].sharding.spec == P("data", "spatial")

    def test_mesh_2d_rejects_bad_shape(self):
        from semanticsegmentation_tensorflow_tpu.parallel import make_mesh_2d
        with pytest.raises(ValueError):
            make_mesh_2d(3, 2)


def test_remat_step_matches_plain_step():
    """remat=True must be numerically identical (same grads, ~3x less
    residual memory) — only speed differs."""
    batch = _batch(2)
    sa = _tiny_state(base_features=8, seed=0, shape=(2, 32, 32, 3),
                     opt="sgd", dtype=jnp.float32)
    sb = _tiny_state(base_features=8, seed=0, shape=(2, 32, 32, 3),
                     opt="sgd", dtype=jnp.float32)
    step_a = make_train_step(num_classes=2)
    step_b = make_train_step(num_classes=2, remat=True)
    sa, oa = step_a(sa, batch)
    sb, ob = step_b(sb, batch)
    np.testing.assert_allclose(float(oa["loss"]), float(ob["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_remat_with_bn_and_dropout():
    state = _tiny_state(name="segnet", shape=(2, 32, 32, 3),
                        width_mult=0.125, use_bn=True)
    step = make_train_step(num_classes=2, remat=True)
    state, out = step(state, _batch(2))
    assert np.isfinite(float(out["loss"]))


def test_spatial_sharded_pallas_stage1_matches_single_device():
    """VERDICT r2 #7: the fused Pallas stage1 is SPMD-compatible — the
    custom_partitioning wrappers shard its row blocks across the 2-D
    height-sharded mesh (halo rows via XLA collective-permute), so the
    2-D mesh no longer forces the jnp fallback, and the grads still match
    the single-device step."""
    from semanticsegmentation_tensorflow_tpu.parallel import make_mesh_2d

    kw = dict(name="fcn8s", fc_features=16, width_mult=1.0,
              packed_stage1=True, pallas_pool=True, pallas_spmd=True,
              dropout_rate=0.0, dtype=jnp.float32)
    batch = _batch(4, h=64, w=32)

    sa = _tiny_state(seed=0, shape=(4, 64, 32, 3), opt="sgd", **kw)
    step_a = make_train_step(num_classes=2)
    # TWO steps: step 2 runs with a NONZERO conv1_1 bias, exercising the
    # edge-halo x bias interaction of the SPMD halo arrays (-inf fill)
    sa, out_a = step_a(sa, batch)
    sa, out_a = step_a(sa, batch)

    mesh = make_mesh_2d(2, 4)
    sb = _tiny_state(seed=0, shape=(4, 64, 32, 3), opt="sgd", **kw)
    sb = replicate(sb, mesh)
    step_b = make_train_step(num_classes=2, mesh=mesh)
    sb, out_b = step_b(sb, shard_batch(batch, mesh))
    sb, out_b = step_b(sb, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(out_a["loss"]), float(out_b["loss"]),
                               rtol=2e-5)
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-6)


def _equality_vs_single_device(kw: dict, mesh, batch, n_steps: int = 2,
                               loss_rtol: float = 5e-5,
                               param_rtol: float = 3e-4,
                               param_atol: float = 3e-6) -> None:
    """Shared harness: n_steps sharded steps == n_steps single-device steps
    (loss + every param). Two steps by default so step 2 runs with NONZERO
    biases — the halo/edge interactions that one-step-from-init tests are
    blind to (the -inf halo-fill lesson, ops/pallas/stage1.py)."""
    shape = tuple(batch["image"].shape[:3]) + (3,)
    sa = _tiny_state(seed=0, shape=shape, opt="sgd", **kw)
    step_a = make_train_step(num_classes=2)
    for _ in range(n_steps):
        sa, out_a = step_a(sa, batch)

    sb = _tiny_state(seed=0, shape=shape, opt="sgd", **kw)
    sb = replicate(sb, mesh)
    step_b = make_train_step(num_classes=2, mesh=mesh)
    sharded = shard_batch(batch, mesh)
    for _ in range(n_steps):
        sb, out_b = step_b(sb, sharded)

    np.testing.assert_allclose(float(out_a["loss"]), float(out_b["loss"]),
                               rtol=loss_rtol)
    flat_a = jax.tree_util.tree_flatten_with_path(sa.params)[0]
    flat_b = jax.tree.leaves(sb.params)
    for (path, a), b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=param_rtol, atol=param_atol,
            err_msg=jax.tree_util.keystr(path))


def test_segnet_packed_dec1_matches_single_device_1d_mesh():
    """VERDICT r3 #5: the default-on SegNet packed decoder stage1 (the
    packed_unpool custom VJP, ops/packed_conv.py) under the 1-D shard_map
    data mesh — grads == single-device."""
    kw = dict(name="segnet", width_mult=1.0, packed_stage1=False,
              packed_dec1=True, dtype=jnp.float32)
    _equality_vs_single_device(kw, make_mesh(), _batch(8, h=32, w=32))


def test_segnet_packed_dec1_matches_single_device_2d_mesh():
    """Same packed_dec1 path under the 2-D height-sharded mesh: the
    custom-VJP packed unpool + packed convs must partition along H (the
    pack dim is W — orthogonal to the sharded axis, but custom_vjp x pjit
    is exactly the combination that bites silently)."""
    from semanticsegmentation_tensorflow_tpu.parallel import make_mesh_2d

    kw = dict(name="segnet", width_mult=1.0, packed_stage1=False,
              packed_dec1=True, dtype=jnp.float32)
    _equality_vs_single_device(kw, make_mesh_2d(2, 4), _batch(4, h=64, w=32))


def test_unet_packed_stage0_matches_single_device_1d_mesh():
    """VERDICT r3 #5: the default-on U-Net packed stage0 (PackedUNetDown0 +
    packed transpose-conv/concat/head, ops/packed_conv.py) under the 1-D
    shard_map data mesh — grads == single-device."""
    kw = dict(name="unet", base_features=64, packed_stage0=True,
              dtype=jnp.float32)
    _equality_vs_single_device(kw, make_mesh(), _batch(8, h=32, w=32))


def test_unet_packed_stage0_matches_single_device_2d_mesh():
    """Same packed_stage0 path under the 2-D height-sharded mesh."""
    from semanticsegmentation_tensorflow_tpu.parallel import make_mesh_2d

    kw = dict(name="unet", base_features=64, packed_stage0=True,
              dtype=jnp.float32)
    _equality_vs_single_device(kw, make_mesh_2d(2, 4), _batch(4, h=64, w=32))


def test_deeplab_packed_stage1_matches_single_device_2d_mesh():
    """Round 5: DeepLab defaults to the fused packed stage1 and
    registry.spmd_safe_kwargs now marks it pallas_spmd-capable — the same
    custom_partitioning halo path FCN/SegNet use, under the 2-D
    height-sharded mesh (grads == single-device)."""
    from semanticsegmentation_tensorflow_tpu.parallel import make_mesh_2d

    kw = dict(name="deeplab", width_mult=1.0, aspp_features=16,
              rates=(2, 4), dropout_rate=0.0, packed_stage1=True,
              pallas_pool=True, pallas_spmd=True, dtype=jnp.float32)
    _equality_vs_single_device(kw, make_mesh_2d(2, 4), _batch(4, h=64, w=32))


def test_spatial_sharded_pallas_segnet_stage1_matches_single_device():
    # loss rtol 5e-5: SegNet's full-width (width_mult=1) tree makes the
    # partitioned CE reduction's f32 summation-order noise ~2e-5; the
    # PARAM check below is the routing-correctness gate (a flipped argmax
    # or halo seam would move gradients by O(grad), far beyond 2e-4)
    """The SegNet-mode fused stage1 (biased codes) also works under the
    2-D height-sharded mesh via its custom_partitioning SPMD mode."""
    from semanticsegmentation_tensorflow_tpu.parallel import make_mesh_2d

    kw = dict(name="segnet", width_mult=1.0, packed_stage1=True,
              pallas_pool=True, pallas_spmd=True, packed_dec1=False,
              dtype=jnp.float32)
    batch = _batch(4, h=64, w=32)

    sa = _tiny_state(seed=0, shape=(4, 64, 32, 3), opt="sgd", **kw)
    step_a = make_train_step(num_classes=2)
    sa, out_a = step_a(sa, batch)

    mesh = make_mesh_2d(2, 4)
    sb = _tiny_state(seed=0, shape=(4, 64, 32, 3), opt="sgd", **kw)
    sb = replicate(sb, mesh)
    step_b = make_train_step(num_classes=2, mesh=mesh)
    sb, out_b = step_b(sb, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(out_a["loss"]), float(out_b["loss"]),
                               rtol=5e-5)
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


class TestGradAccum:
    """grad_accum=k microbatching (train/step.py:_accum_grads).

    The sum-form loss means accumulation differs from the full-batch step
    only by float summation order — same invariant the mesh tests assert.
    Dropout-free models here: with dropout, each microbatch deliberately
    draws an independent mask (fold_in on the microbatch index), so exact
    equality is only defined without it.
    """

    def test_accum_matches_full_batch(self):
        batch = _batch(8)
        kw = dict(base_features=8, dtype=jnp.float32)

        sa = _tiny_state(seed=0, shape=(8, 32, 32, 3), opt="sgd", **kw)
        step_a = make_train_step(num_classes=2)
        sa, out_a = step_a(sa, batch)

        sb = _tiny_state(seed=0, shape=(8, 32, 32, 3), opt="sgd", **kw)
        step_b = make_train_step(num_classes=2, grad_accum=4)
        sb, out_b = step_b(sb, batch)

        np.testing.assert_allclose(float(out_a["loss"]), float(out_b["loss"]),
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(out_a["cm"]),
                                      np.asarray(out_b["cm"]))
        for a, b in zip(jax.tree.leaves(sa.params),
                        jax.tree.leaves(sb.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-6)

    def test_accum_sharded_matches_single_device(self):
        """grad_accum composes with the 1-D mesh: per-shard accumulation,
        one psum on the accumulated sums."""
        mesh = make_mesh()
        batch = _batch(16)
        kw = dict(base_features=8, dtype=jnp.float32)

        sa = _tiny_state(seed=0, shape=(16, 32, 32, 3), opt="sgd", **kw)
        step_a = make_train_step(num_classes=2, grad_accum=2)
        sa, out_a = step_a(sa, batch)

        sb = _tiny_state(seed=0, shape=(16, 32, 32, 3), opt="sgd", **kw)
        sb = replicate(sb, mesh)
        step_b = make_train_step(num_classes=2, mesh=mesh, grad_accum=2)
        sb, out_b = step_b(sb, shard_batch(batch, mesh))

        np.testing.assert_allclose(float(out_a["loss"]), float(out_b["loss"]),
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(out_a["cm"]),
                                      np.asarray(out_b["cm"]))
        for a, b in zip(jax.tree.leaves(sa.params),
                        jax.tree.leaves(sb.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-6)

    def test_accum_with_bn_threads_stats(self):
        """BN running stats under accumulation == k sequential small steps'
        stats chain (microbatch i+1 sees i's stats)."""
        kw = dict(name="segnet", width_mult=0.125, use_bn=True)
        batch = _batch(4)
        micro = {k: v[2:] for k, v in batch.items()}

        sa = _tiny_state(seed=0, shape=(4, 32, 32, 3), **kw)
        step_a = make_train_step(num_classes=2, grad_accum=2)
        sa, out_a = step_a(sa, batch)
        assert np.isfinite(float(out_a["loss"]))

        # reference stats chain: forward the two microbatches sequentially
        # (params frozen — accumulation applies one update at the END)
        sb = _tiny_state(seed=0, shape=(4, 32, 32, 3), **kw)
        stats = sb.batch_stats
        for mb in ({k: v[:2] for k, v in batch.items()}, micro):
            _, mut = sb.apply_fn({"params": sb.params, "batch_stats": stats},
                                 mb["image"], train=True,
                                 mutable=["batch_stats"])
            stats = mut["batch_stats"]
        # The eager reference chain and the jitted scan differ by bf16-
        # policy rounding order (~1e-4 on these tiny stats), so the check
        # is comparative: the accumulated stats must sit on the SEQUENTIAL
        # chain, far closer to it than to a single full-batch update
        # (which applies the momentum decay once instead of twice).
        _, mut = sb.apply_fn(
            {"params": sb.params, "batch_stats": sb.batch_stats},
            batch["image"], train=True, mutable=["batch_stats"])
        acc = jax.tree.leaves(sa.batch_stats)
        chain = jax.tree.leaves(stats)
        one_shot = jax.tree.leaves(mut["batch_stats"])
        d_chain = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                      for a, b in zip(acc, chain))
        d_one = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                    for a, b in zip(acc, one_shot))
        # measured: d_chain ~1.1e-3 (bf16 noise), d_one ~2e-2 (the extra
        # momentum decay) — 17x apart
        assert d_chain < 3e-3, d_chain
        assert d_chain < 0.2 * d_one, (d_chain, d_one)

    def test_accum_with_augment_and_dropout_runs(self):
        aug = make_augment_fn((127.5, 127.5, 127.5), (58.0, 58.0, 58.0))
        state = _tiny_state(name="fcn8s", shape=(4, 32, 32, 3),
                            fc_features=64, width_mult=0.125,
                            dropout_rate=0.5)
        step = make_train_step(num_classes=2, augment_fn=aug, grad_accum=2)
        b = synthetic_batch(4, 32, 32)
        batch = {"image": jnp.asarray((b["image"] * 58.0 + 127.5).astype(np.uint8)),
                 "label": jnp.asarray(b["label"]),
                 "valid": jnp.asarray(b["valid"])}
        state, out = step(state, batch)
        assert np.isfinite(float(out["loss"]))
        assert int(state.step) == 1

    def test_accum_rejects_indivisible_batch(self):
        state = _tiny_state(base_features=8)
        step = make_train_step(num_classes=2, grad_accum=3)
        with pytest.raises(ValueError, match="grad_accum"):
            step(state, _batch(4))
