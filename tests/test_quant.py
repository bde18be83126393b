"""Post-training int8 quantization (infer/quant.py).

The integer path is exact arithmetic (s8 x s8 -> s32), so the core tests
are EQUALITY against a float oracle computing the same quantized math —
not loose tolerances. Accuracy-preservation is covered by logit-agreement
checks across all four model families.
"""

import numpy as np
import pytest

import flax.linen as nn
import flax.serialization
import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.infer import quant
from semanticsegmentation_tensorflow_tpu.models import build_model

jax.config.update("jax_platforms", "cpu")


class _ConvNet(nn.Module):
    """Conv (strided) -> relu -> dilated Conv -> ConvTranspose."""

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.relu(nn.Conv(8, (3, 3), strides=(2, 2), padding="SAME",
                            name="c0")(x))
        x = nn.relu(nn.Conv(8, (3, 3), kernel_dilation=(2, 2),
                            padding="SAME", name="c1")(x))
        return nn.ConvTranspose(4, (2, 2), strides=(2, 2), name="up")(x)


def _net_and_vars(seed=0, shape=(2, 16, 16, 3)):
    m = _ConvNet()
    v = m.init(jax.random.key(seed), jnp.zeros(shape))
    return m, v, shape


class TestKernelQuant:
    def test_error_bound_and_roundtrip(self):
        k = np.random.default_rng(0).normal(size=(3, 3, 16, 32)).astype(
            np.float32)
        q, s = quant.quantize_kernel(k)
        q, s = np.asarray(q), np.asarray(s)
        assert q.dtype == np.int8 and s.shape == (32,)
        assert (s > 0).all()
        # symmetric rounding: |k - q*s| <= s/2 per output channel
        err = np.abs(k - q * s)
        assert (err <= s / 2 + 1e-6).all()
        # the amax channel entry hits +-127 exactly
        assert np.abs(q).max() == 127

    def test_zero_kernel_safe(self):
        q, s = quant.quantize_kernel(np.zeros((1, 1, 4, 4), np.float32))
        assert np.asarray(s).min() == 1.0  # guard, no div-by-zero
        assert (np.asarray(q) == 0).all()


class TestDiscovery:
    def test_conv_paths_include_transpose(self):
        m, v, shape = _net_and_vars()
        paths = quant.conv_paths(m, v, shape)
        assert paths == ["c0", "c1", "up"]  # ConvTranspose quantizes too

    def test_quantize_variables_tree(self):
        m, v, shape = _net_and_vars()
        qv = quant.quantize_variables(m, v, shape)
        for name, cout in (("c0", 8), ("c1", 8), ("up", 4)):
            p = qv["params"][name]
            assert p["kernel"].dtype == np.int8
            assert p["kernel_scale"].shape == (cout,)
            np.testing.assert_array_equal(p["bias"],
                                          np.asarray(v["params"][name]["bias"]))


class TestQuantizedConvMath:
    def test_int8_path_equals_float_oracle(self):
        """The interceptor's integer conv/conv_transpose path must equal
        the same quantized math done in f32 (exact: integer products are
        < 2^24, where f32 is exact) — bitwise."""
        m, v, shape = _net_and_vars()
        x = jax.random.normal(jax.random.key(1), shape, jnp.float32) * 2.0
        scales = quant.calibrate_act_scales(m, v, [np.asarray(x)])
        assert set(scales) == {"c0", "c1", "up"}
        qv = quant.quantize_variables(m, v, shape)
        got = np.asarray(quant.make_apply(m, scales)(qv, x, train=False))
        want = np.asarray(_oracle_apply(m, scales)(qv, x, train=False))
        np.testing.assert_array_equal(got, want)

    def test_weight_only_close_to_fp(self):
        m, v, shape = _net_and_vars()
        x = jax.random.normal(jax.random.key(2), shape, jnp.float32)
        fp = m.apply(v, x, train=False)
        qv = quant.quantize_variables(m, v, shape)
        wo = quant.make_apply(m, {})(qv, x, train=False)  # no act scales
        err = np.abs(np.asarray(fp) - np.asarray(wo))
        ref = np.abs(np.asarray(fp)).max()
        assert err.max() <= 0.02 * ref + 1e-3

    def test_float_tree_passthrough_is_bit_exact(self):
        """make_apply on an UNQUANTIZED tree must be the identity."""
        m, v, shape = _net_and_vars()
        x = jax.random.normal(jax.random.key(3), shape, jnp.float32)
        a = m.apply(v, x, train=False)
        b = quant.make_apply(m, {"c0": 0.1})(v, x, train=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


MODELS = [
    ("fcn8s", dict(fc_features=16, width_mult=0.0625)),
    ("unet", dict(base_features=8)),
    ("segnet", dict(width_mult=0.125)),
    ("deeplab", dict(width_mult=0.125, aspp_features=16)),
]


def _oracle_apply(model, scales):
    """Float oracle of make_apply's EXACT quantized math: same activation
    quantization, same int8 kernels — but the conv itself runs in f32.
    Integer products here stay < 2^24, where f32 is exact, so the int8
    path must match BITWISE (incl. the bf16 output cast)."""
    import jax.lax as lax

    def icpt(next_fun, args, kwargs, context):
        mod = context.module
        if not (context.method_name == "__call__"
                and quant._conv_supported(mod)
                and mod.variables["params"]["kernel"].dtype == jnp.int8):
            return next_fun(*args, **kwargs)
        p = mod.variables["params"]
        kq = jnp.asarray(p["kernel"], jnp.float32)
        x = args[0]
        strides = quant._pair(mod.strides or 1)
        dil = quant._pair(mod.kernel_dilation or 1)
        out_dt = mod.dtype or x.dtype
        sx = scales.get(quant._path_key(mod))
        dn = ("NHWC", "HWIO", "NHWC")

        def conv(lhs, rhs):
            if type(mod) is nn.ConvTranspose:
                return lax.conv_transpose(lhs, rhs, strides, mod.padding,
                                          rhs_dilation=dil,
                                          dimension_numbers=dn)
            return lax.conv_general_dilated(
                lhs, rhs, strides, mod.padding, rhs_dilation=dil,
                dimension_numbers=dn)

        if sx is None:
            k = (kq * p["kernel_scale"]).astype(out_dt)
            y = conv(x.astype(out_dt), k).astype(jnp.float32)
        else:
            q = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / sx)),
                         -127, 127)
            # mirror make_apply: y32.astype(f32) * (kscale * sx)
            y = conv(q, kq) * (jnp.asarray(p["kernel_scale"]) * sx)
        if mod.use_bias:
            y = y + p["bias"].astype(jnp.float32)
        return y.astype(out_dt)

    def apply_fn(variables, *args, **kwargs):
        with nn.intercept_methods(icpt):
            return model.apply(variables, *args, **kwargs)

    return apply_fn


class TestModelFamilies:
    @pytest.mark.parametrize("name,kw", MODELS, ids=[m[0] for m in MODELS])
    def test_int8_path_bit_equals_float_oracle(self, name, kw):
        """The integer conv path == the f32 oracle of the same quantized
        program, bitwise, on every family (exact arithmetic both sides)."""
        model = build_model(name, num_classes=2, **kw)
        shape = (2, 64, 64, 3)
        v = model.init(jax.random.key(0), jnp.zeros(shape))
        rng = np.random.default_rng(0)
        calib = [rng.normal(size=shape).astype(np.float32)
                 for _ in range(2)]
        qv, apply_fn, scales = quant.quantize_for_inference(
            model, v, calib, shape)
        assert scales, f"{name}: no convs calibrated"
        x = jnp.asarray(calib[0])
        q8 = np.asarray(apply_fn(qv, x, train=False), np.float32)
        want = np.asarray(_oracle_apply(model, scales)(qv, x, train=False),
                          np.float32)
        assert np.isfinite(q8).all()
        np.testing.assert_array_equal(q8, want, err_msg=name)

    def test_trained_model_accuracy_survives_int8(self):
        """Statistical check on a net with REAL structure (not random-init
        noise): overfit a tiny U-Net to a synthetic batch, then the int8
        forward must keep the learned segmentation (argmax) almost
        everywhere."""
        from semanticsegmentation_tensorflow_tpu.train.state import (
            create_train_state, make_optimizer,
        )
        from semanticsegmentation_tensorflow_tpu.train.step import (
            make_train_step,
        )
        model = build_model("unet", num_classes=2, base_features=8)
        shape = (4, 32, 32, 3)
        state = create_train_state(model, jax.random.key(0), shape,
                                   make_optimizer("adam", 3e-3))
        rng = np.random.default_rng(5)
        img = rng.normal(size=shape).astype(np.float32)
        lab = (img[..., 0] > 0).astype(np.int32)  # learnable rule
        batch = {"image": img, "label": lab,
                 "valid": np.ones(shape[:3], bool)}
        step = make_train_step(2, with_metrics=False)
        for _ in range(60):
            state, out = step(state, batch)
        assert float(out["loss"]) < 0.3
        v = {"params": state.params}
        fp = np.asarray(model.apply(v, img, train=False))
        qv, apply_fn, _ = quant.quantize_for_inference(
            model, v, [img], shape)
        q8 = np.asarray(apply_fn(qv, jnp.asarray(img), train=False))
        agree = (fp.argmax(-1) == q8.argmax(-1)).mean()
        assert agree > 0.97, f"argmax agreement {agree}"


class TestBNFold:
    def _trained_bn_state(self, name, kw, shape=(4, 32, 32, 3), steps=5):
        """A BN model with NON-trivial running stats (fresh init is
        mean=0/var=1, which folds trivially)."""
        from semanticsegmentation_tensorflow_tpu.train.state import (
            create_train_state, make_optimizer,
        )
        from semanticsegmentation_tensorflow_tpu.train.step import (
            make_train_step,
        )
        model = build_model(name, num_classes=2, use_bn=True,
                            dtype=jnp.float32, **kw)
        state = create_train_state(model, jax.random.key(0), shape,
                                   make_optimizer("adam", 1e-3))
        rng = np.random.default_rng(11)
        batch = {"image": rng.normal(size=shape).astype(np.float32) * 3,
                 "label": rng.integers(0, 2, shape[:3]).astype(np.int32),
                 "valid": np.ones(shape[:3], bool)}
        step = make_train_step(2, with_metrics=False)
        for _ in range(steps):
            state, _ = step(state, batch)
        v = {"params": state.params, "batch_stats": state.batch_stats}
        return model, jax.tree.map(np.asarray, v), batch["image"]

    @pytest.mark.parametrize("name,kw", [
        ("unet", dict(base_features=8)),
        ("deeplab", dict(width_mult=0.125, aspp_features=16)),
    ], ids=["unet", "deeplab"])
    def test_fold_preserves_eval_function(self, name, kw):
        model, v, img = self._trained_bn_state(name, kw)
        fv, n = quant.fold_batchnorm(v)
        assert n > 0, "no conv/BN pairs folded"
        a = np.asarray(model.apply(v, img, train=False), np.float32)
        b = np.asarray(model.apply(fv, img, train=False), np.float32)
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4)
        # stats actually moved (the fold was non-trivial)
        assert any(abs(np.asarray(s)).max() > 1e-3
                   for s in jax.tree.leaves(v["batch_stats"])
                   if s.size)

    def test_bn_entries_neutralized(self):
        model, v, img = self._trained_bn_state("unet",
                                               dict(base_features=8))
        fv, n = quant.fold_batchnorm(v)
        assert n > 0
        # every folded bn: scale==1, bias==0, mean==0, var==1-eps
        def check(node, stats):
            for k, p in node.items():
                if isinstance(p, dict) and "scale" in p and k in stats \
                        and isinstance(stats[k], dict) \
                        and "mean" in stats[k]:
                    np.testing.assert_array_equal(p["scale"],
                                                  np.ones_like(p["scale"]))
                    np.testing.assert_array_equal(
                        stats[k]["mean"], np.zeros_like(stats[k]["mean"]))
                elif isinstance(p, dict):
                    check(p, stats.get(k, {}))
        check(fv["params"], fv["batch_stats"])

    def test_int8_on_bn_model_folds_automatically(self):
        model, v, img = self._trained_bn_state("unet",
                                               dict(base_features=8))
        qv, apply_fn, scales = quant.quantize_for_inference(
            model, v, [img], img.shape)
        assert scales
        fp = np.asarray(model.apply(v, img, train=False), np.float32)
        q8 = np.asarray(apply_fn(qv, jnp.asarray(img), train=False),
                        np.float32)
        assert np.isfinite(q8).all()
        agree = (fp.argmax(-1) == q8.argmax(-1)).mean()
        assert agree > 0.95, f"BN-folded int8 argmax agreement {agree}"


class TestQAT:
    def test_on_grid_weights_pass_through_with_exact_grads(self):
        """Weights already ON the int8 grid (integer values, amax=127 per
        channel -> scale 1) make weight fake-quant a no-op — forward AND
        gradient must equal the plain model bitwise (the STE passes
        gradients through unchanged)."""
        m, v, shape = _net_and_vars()
        rng = np.random.default_rng(7)

        def gridify(k):
            k = rng.integers(-126, 127, k.shape).astype(np.float32)
            k[0, 0, 0, ...] = 127.0  # pin per-channel amax -> scale 1
            return jnp.asarray(k)

        v = jax.tree.map(lambda x: gridify(x) if x.ndim == 4 else x, v)
        x = jnp.asarray(rng.integers(-5, 6, shape).astype(np.float32))
        fq = quant.make_fake_quant_apply(m, {})  # weight-only fake-quant

        def loss_fq(v):
            return jnp.sum(fq(v, x, train=False) ** 2)

        def loss_fp(v):
            return jnp.sum(m.apply(v, x, train=False) ** 2)

        lf, gf = jax.value_and_grad(loss_fq)(v)
        lp, gp = jax.value_and_grad(loss_fp)(v)
        np.testing.assert_array_equal(np.asarray(lf), np.asarray(lp))
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), gf, gp)

    def test_fake_quant_forward_matches_int8_serving(self):
        """The QAT forward and the deployed int8 program compute the same
        quantized product (up to f32 rounding of the dequantized
        operands)."""
        m, v, shape = _net_and_vars()
        x = jax.random.normal(jax.random.key(8), shape, jnp.float32)
        scales = quant.calibrate_act_scales(m, v, [np.asarray(x)])
        fq = np.asarray(quant.make_fake_quant_apply(m, scales)(
            v, x, train=False))
        qv = quant.quantize_variables(m, v, shape)
        q8 = np.asarray(quant.make_apply(m, scales)(qv, x, train=False))
        np.testing.assert_allclose(fq, q8, rtol=2e-5, atol=1e-6)

    def test_qat_trains_and_serves_consistently(self):
        """The documented flow: FP pretrain -> calibrate on the trained
        activations -> QAT finetune THROUGH the fake-quant forward (STE
        gradients keep improving the loss) -> the int8 serving path
        reproduces the trained forward's argmax. (Calibrating on an
        UNTRAINED net stalls QAT — the stale clip range throttles grown
        activations — which is why --qat documents 'after FP
        pretraining'.)"""
        from semanticsegmentation_tensorflow_tpu.train.state import (
            create_train_state, make_optimizer,
        )
        from semanticsegmentation_tensorflow_tpu.train.step import (
            make_train_step,
        )
        model = build_model("unet", num_classes=2, base_features=8)
        shape = (4, 32, 32, 3)
        state = create_train_state(model, jax.random.key(0), shape,
                                   make_optimizer("adam", 3e-3))
        rng = np.random.default_rng(9)
        img = rng.normal(size=shape).astype(np.float32)
        lab = (img[..., 0] > 0).astype(np.int32)
        batch = {"image": img, "label": lab,
                 "valid": np.ones(shape[:3], bool)}
        step = make_train_step(2, with_metrics=False)
        for _ in range(60):  # FP pretrain
            state, out = step(state, batch)
        fp_loss = float(out["loss"])
        assert fp_loss < 0.3
        scales = quant.calibrate_act_scales(
            model, {"params": state.params}, [img])
        state = state.replace(
            apply_fn=quant.make_fake_quant_apply(model, scales))
        for _ in range(30):  # QAT finetune through the fake-quant forward
            state, out = step(state, batch)
        assert float(out["loss"]) < fp_loss + 0.05, (
            "QAT finetune regressed the loss")
        fq = np.asarray(state.apply_fn({"params": state.params}, img,
                                       train=False))
        qv, apply_fn, _ = quant.quantize_for_inference(
            model, {"params": state.params}, None, shape,
            act_scales=scales)
        q8 = np.asarray(apply_fn(qv, jnp.asarray(img), train=False))
        agree = (fq.argmax(-1) == q8.argmax(-1)).mean()
        assert agree > 0.99, f"QAT->int8 argmax agreement {agree}"

    def test_scales_json_round_trip(self, tmp_path):
        p = str(tmp_path / "qat_scales.json")
        scales = {"enc/conv0": 0.0123, "up": 1.5}
        quant.save_act_scales(p, scales)
        assert quant.load_act_scales(p) == scales


class TestServingIntegration:
    def _quantized_predictor(self, mesh=None, bn=False):
        from semanticsegmentation_tensorflow_tpu.infer.predict import (
            Predictor,
        )
        kw = dict(base_features=8, use_bn=bn) if bn else dict(
            base_features=8)
        model = build_model("unet", num_classes=2, **kw)
        shape = (1, 32, 64, 3)
        v = model.init(jax.random.key(0), jnp.zeros(shape))
        rng = np.random.default_rng(1)
        calib = [rng.normal(size=shape).astype(np.float32)]
        qv, apply_fn, _ = quant.quantize_for_inference(model, v, calib,
                                                       shape)
        return model, qv, apply_fn, Predictor(
            model, qv, (32, 64), mesh=mesh, apply_fn=apply_fn)

    def test_predictor_mesh_equals_single(self):
        from jax.sharding import Mesh

        from semanticsegmentation_tensorflow_tpu.parallel.mesh import (
            DATA_AXIS,
        )
        model, qv, apply_fn, single = self._quantized_predictor()
        mesh = Mesh(np.asarray(jax.devices()[:4]), (DATA_AXIS,))
        meshed = self._quantized_predictor(mesh=mesh)[3]
        imgs = np.random.default_rng(2).integers(
            0, 255, (4, 32, 64, 3)).astype(np.uint8)
        ov1, lb1 = single(imgs)
        ov2, lb2 = meshed(imgs)
        np.testing.assert_array_equal(lb1, lb2)
        np.testing.assert_array_equal(ov1, ov2)

    def test_export_int8_roundtrip(self, tmp_path):
        from semanticsegmentation_tensorflow_tpu.infer.export import (
            ExportedPredictor, export_model,
        )
        model, qv, apply_fn, pred = self._quantized_predictor()
        p8 = str(tmp_path / "q.segx")
        export_model(model, qv, (32, 64), p8, platforms=("cpu",),
                     apply_fn=apply_fn)
        pfp = str(tmp_path / "fp.segx")
        v = model.init(jax.random.key(0), jnp.zeros((1, 32, 64, 3)))
        export_model(model, v, (32, 64), pfp, platforms=("cpu",))
        exp = ExportedPredictor(p8)
        imgs = np.random.default_rng(3).integers(
            0, 255, (2, 32, 64, 3)).astype(np.uint8)
        ov_a, lb_a = pred(imgs)
        ov_b, lb_b = exp(imgs)
        np.testing.assert_array_equal(lb_a, lb_b)
        np.testing.assert_array_equal(ov_a, ov_b)
        # int8 weights actually shrink the artifact's params entry
        import zipfile

        size8 = zipfile.ZipFile(p8).getinfo("params.msgpack").file_size
        sizef = zipfile.ZipFile(pfp).getinfo("params.msgpack").file_size
        assert size8 < 0.5 * sizef, (size8, sizef)

    def test_quantized_eval_step(self):
        """TrainState with swapped apply_fn/params runs the stock eval
        step (the scripts/eval.py --int8 path)."""
        from semanticsegmentation_tensorflow_tpu.train.state import (
            create_train_state, make_optimizer,
        )
        from semanticsegmentation_tensorflow_tpu.train.step import (
            make_eval_step,
        )
        model = build_model("unet", num_classes=2, base_features=8)
        shape = (4, 32, 32, 3)
        state = create_train_state(model, jax.random.key(0), shape,
                                   make_optimizer("adam", 1e-3))
        rng = np.random.default_rng(4)
        calib = [rng.normal(size=shape).astype(np.float32)]
        qv, apply_fn, _ = quant.quantize_for_inference(
            model, {"params": state.params}, calib, shape)
        qstate = state.replace(params=qv["params"], apply_fn=apply_fn)
        batch = {
            "image": rng.normal(size=shape).astype(np.float32),
            "label": rng.integers(0, 2, shape[:3]).astype(np.int32),
            "valid": np.ones(shape[:3], bool),
        }
        out = make_eval_step(2)(qstate, batch)
        assert np.isfinite(float(out["loss"]))
        assert int(np.asarray(out["cm"]).sum()) == int(
            batch["valid"].sum())

        # identity-config TTA over the SAME quantized apply reproduces the
        # plain quantized eval step exactly (loss, cm) — the
        # eval.py --int8 --tta composition
        from semanticsegmentation_tensorflow_tpu.infer.tta import (
            make_tta_eval_step,
        )
        tta = make_tta_eval_step(model, 2, scales=(1.0,), flip=False,
                                 apply_fn=qstate.apply_fn)
        out2 = tta(qstate, batch)
        np.testing.assert_allclose(float(out2["loss"]),
                                   float(out["loss"]), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(out2["cm"]),
                                      np.asarray(out["cm"]))

        # quantized eval under the shard_map mesh == single-device
        # (the eval.py --int8 --mesh path)
        from jax.sharding import Mesh

        from semanticsegmentation_tensorflow_tpu.parallel import replicate
        from semanticsegmentation_tensorflow_tpu.parallel.mesh import (
            DATA_AXIS,
        )
        mesh = Mesh(np.asarray(jax.devices()[:4]), (DATA_AXIS,))
        mout = make_eval_step(2, mesh=mesh)(replicate(qstate, mesh), batch)
        np.testing.assert_allclose(float(mout["loss"]),
                                   float(out["loss"]), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(mout["cm"]),
                                      np.asarray(out["cm"]))


class TestQuantSafeRebuild:
    """registry.quant_safe_kwargs: the int8/QAT CLIs rebuild the model with
    every conv routed through nn.Conv so the interceptor sees them all.
    Found in the round-5 drive: the production packed flags left FCN-8s
    with only 5 of ~21 convs quantized (fc6/fc7 + the three score convs) —
    the whole VGG backbone ran un-quantized through PooledConvBlock's raw
    lax convs / the Pallas stage1."""

    CASES = [
        # (name, production-ish kwargs at test scale, min quant-safe convs)
        ("fcn8s", dict(fc_features=64), 21),
        ("segnet", dict(), 26),
        ("unet", dict(base_features=64, depth=2), 12),
        ("deeplab", dict(width_mult=0.25, aspp_features=16), 21),
    ]

    @pytest.mark.parametrize("name,kw,min_convs", CASES,
                             ids=[c[0] for c in CASES])
    def test_exposes_every_conv(self, name, kw, min_convs):
        from semanticsegmentation_tensorflow_tpu.models.registry import (
            quant_safe_kwargs,
        )
        shape = (1, 64, 64, 3)
        qkw = dict(kw, **quant_safe_kwargs(name))
        mq = build_model(name, num_classes=2, **qkw)
        vq = mq.init(jax.random.key(0), jnp.zeros(shape, jnp.bfloat16),
                     train=False)
        paths = quant.conv_paths(mq, vq, shape)
        assert len(paths) >= min_convs, (name, sorted(paths))

        # and the production build exposes strictly fewer (the bug this
        # guards against: silently partial quantization coverage)
        mp = build_model(name, num_classes=2, **kw)
        vp = mp.init(jax.random.key(0), jnp.zeros(shape, jnp.bfloat16),
                     train=False)
        assert len(quant.conv_paths(mp, vp, shape)) < len(paths), name

    @pytest.mark.parametrize("name,kw,min_convs", CASES,
                             ids=[c[0] for c in CASES])
    def test_production_checkpoint_loads_and_matches(self, name, kw,
                                                     min_convs):
        """A checkpoint trained under the production (packed) flags must
        restore into the quant-safe rebuild unchanged (identical param
        trees) and produce the same function up to float summation order."""
        from semanticsegmentation_tensorflow_tpu.models.registry import (
            quant_safe_kwargs,
        )
        shape = (1, 64, 64, 3)
        mp = build_model(name, num_classes=2, **kw)
        vp = mp.init(jax.random.key(0), jnp.zeros(shape, jnp.bfloat16),
                     train=False)
        qkw = dict(kw, **quant_safe_kwargs(name))
        mq = build_model(name, num_classes=2, **qkw)
        vq = mq.init(jax.random.key(1), jnp.zeros(shape, jnp.bfloat16),
                     train=False)
        # identical trees (paths AND shapes) — checkpoints interchange
        fp = {p: l.shape for p, l in
              flax.traverse_util.flatten_dict(vp["params"]).items()}
        fq = {p: l.shape for p, l in
              flax.traverse_util.flatten_dict(vq["params"]).items()}
        assert fp == fq, name

        x = jnp.asarray(np.random.default_rng(0).normal(size=shape),
                        jnp.float32)
        yp = np.asarray(mp.apply(vp, x, train=False), np.float32)
        yq = np.asarray(mq.apply(vp, x, train=False), np.float32)
        # bf16 compute, different summation order across the packed/fused
        # rewrites — close, not bitwise
        np.testing.assert_allclose(yq, yp, atol=0.15, rtol=0.05,
                                   err_msg=name)


class TestQatFpEvalWarning:
    """eval/test CLIs must warn when a QAT checkpoint runs without its
    activation clamps (measured on-chip: fp loss 455.6 vs 0.6901 with the
    scales applied — scripts/eval.py round-5 finding)."""

    def test_warns_when_scales_present_and_fp(self, tmp_path, capsys):
        quant.save_act_scales(str(tmp_path / "qat_scales.json"), {"c0": 1.5})
        import io

        buf = io.StringIO()
        assert quant.warn_qat_fp_eval(str(tmp_path), int8=False, file=buf)
        msg = buf.getvalue()
        assert "qat_scales.json present" in msg
        assert "--int8" in msg

    def test_silent_when_int8(self, tmp_path):
        quant.save_act_scales(str(tmp_path / "qat_scales.json"), {"c0": 1.5})
        import io

        buf = io.StringIO()
        assert not quant.warn_qat_fp_eval(str(tmp_path), int8=True, file=buf)
        assert buf.getvalue() == ""

    def test_silent_when_no_scales(self, tmp_path):
        import io

        buf = io.StringIO()
        assert not quant.warn_qat_fp_eval(str(tmp_path), int8=False, file=buf)
        assert buf.getvalue() == ""
