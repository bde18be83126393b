import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semanticsegmentation_tensorflow_tpu.train.metrics import (
    SegMetrics, confusion_matrix, iou_from_confusion,
)
from semanticsegmentation_tensorflow_tpu.train.loss import (
    softmax_cross_entropy_loss,
)


def test_confusion_matrix_counts():
    true = jnp.asarray([[0, 0, 1, 1, 2]])
    pred = jnp.asarray([[0, 1, 1, 1, 0]])
    cm = np.asarray(confusion_matrix(true, pred, 3))
    expected = np.array([[1, 1, 0], [0, 2, 0], [1, 0, 0]])
    np.testing.assert_array_equal(cm, expected)


def test_confusion_matrix_respects_valid_mask():
    true = jnp.asarray([0, 1, 1])
    pred = jnp.asarray([0, 1, 0])
    valid = jnp.asarray([1, 1, 0])
    cm = np.asarray(confusion_matrix(true, pred, 2, valid))
    np.testing.assert_array_equal(cm, [[1, 0], [0, 1]])


def test_confusion_matrix_direct_impl_matches_matmul():
    """The 'direct' compare-and-reduce form (round-4 A/B candidate for the
    metrics excess) must count identically to the matmul form."""
    rng = np.random.default_rng(0)
    true = jnp.asarray(rng.integers(0, 3, (7, 11)))
    pred = jnp.asarray(rng.integers(0, 3, (7, 11)))
    valid = jnp.asarray(rng.integers(0, 2, (7, 11)))
    for v in (None, valid):
        a = np.asarray(confusion_matrix(true, pred, 3, v, impl="matmul"))
        b = np.asarray(confusion_matrix(true, pred, 3, v, impl="direct"))
        np.testing.assert_array_equal(a, b)


def test_iou_perfect_and_disjoint():
    perfect = jnp.eye(3) * 10
    iou, miou = iou_from_confusion(perfect)
    assert float(miou) == 1.0
    disjoint = jnp.asarray([[0, 5], [5, 0]], jnp.float32)
    iou, miou = iou_from_confusion(disjoint)
    assert float(miou) == 0.0


def test_miou_ignores_absent_classes():
    cm = jnp.zeros((3, 3)).at[0, 0].set(4).at[1, 1].set(4)  # class 2 absent
    _, miou = iou_from_confusion(cm)
    assert float(miou) == 1.0


def test_seg_metrics_accumulate():
    m = SegMetrics.zero(2)
    cm = jnp.asarray([[2, 0], [0, 2]])
    m = m.update(cm, jnp.float32(1.0)).update(cm, jnp.float32(3.0))
    s = m.summary()
    assert float(s["loss"]) == 2.0
    assert float(s["miou"]) == 1.0
    assert float(s["pixel_acc"]) == 1.0


def test_ce_loss_matches_manual():
    logits = jnp.asarray([[[[2.0, 0.0], [0.0, 2.0]]]])  # [1,1,2,2]
    onehot = jnp.asarray([[[[1.0, 0.0], [1.0, 0.0]]]])
    loss = float(softmax_cross_entropy_loss(logits, onehot))
    # pixel 1: -log softmax(2,0)[0]; pixel 2: -log softmax(0,2)[0]
    p1 = np.log(1 + np.exp(-2.0))
    p2 = np.log(1 + np.exp(2.0))
    np.testing.assert_allclose(loss, (p1 + p2) / 2, rtol=1e-3)


def test_ce_loss_mask_excludes_pixels():
    logits = jnp.asarray([[[[2.0, 0.0], [0.0, 2.0]]]])
    onehot = jnp.asarray([[[[1.0, 0.0], [1.0, 0.0]]]])
    mask = jnp.asarray([[[1.0, 0.0]]])
    loss = float(softmax_cross_entropy_loss(logits, onehot, mask))
    np.testing.assert_allclose(loss, np.log(1 + np.exp(-2.0)), rtol=1e-3)


def test_ce_loss_class_weights_manual():
    """Weighted CE = sum(w[true_class] * ce) / valid_count (Eigen & Fergus
    convention); weights of all-ones are bit-identical to no weights."""
    logits = jnp.asarray([[[[2.0, 0.0], [0.0, 2.0]]]])  # [1,1,2,2]
    # pixel 1 true class 0, pixel 2 true class 1
    onehot = jnp.asarray([[[[1.0, 0.0], [0.0, 1.0]]]])
    w = jnp.asarray([3.0, 0.5])
    loss = float(softmax_cross_entropy_loss(logits, onehot,
                                            class_weights=w))
    ce1 = np.log(1 + np.exp(-2.0))  # both pixels: true class has logit 2
    np.testing.assert_allclose(loss, (3.0 * ce1 + 0.5 * ce1) / 2, rtol=1e-3)

    ones = softmax_cross_entropy_loss(logits, onehot,
                                      class_weights=jnp.ones(2))
    plain = softmax_cross_entropy_loss(logits, onehot)
    np.testing.assert_array_equal(np.asarray(ones), np.asarray(plain))


def test_median_frequency_weights():
    from semanticsegmentation_tensorflow_tpu.train.loss import (
        median_frequency_weights,
    )

    # freqs .75/.25 -> median .5 -> weights [2/3, 2]; absent class -> 0
    w = np.asarray(median_frequency_weights([300, 100]))
    np.testing.assert_allclose(w, [2 / 3, 2.0], rtol=1e-6)
    # absent class -> weight 0; median is over PRESENT classes only, so
    # the present weights are unchanged
    w3 = np.asarray(median_frequency_weights([300, 100, 0]))
    np.testing.assert_allclose(w3[:2], [2 / 3, 2.0], rtol=1e-6)
    assert w3[2] == 0.0


class TestCMajorLoss:
    """softmax_cross_entropy_sum_cmajor == the one-hot NHWC form — values,
    counts, and GRADIENTS — for every mask/weight combination. The cmajor
    form exists because C-minor logits at tiny C tile as T(2,128)/T(4,128)
    (2-3% lane use); the round-5 SegNet profile measured ~10 ms/step in
    the loss+argmax chain (SEG_LOSS_IMPL gates the on-chip A/B)."""

    def _case(self, seed, C=3, shape=(2, 8, 10)):
        from semanticsegmentation_tensorflow_tpu.train.loss import (
            softmax_cross_entropy_sum, softmax_cross_entropy_sum_cmajor,
        )
        rng = np.random.default_rng(seed)
        logits = jnp.asarray(rng.normal(size=shape + (C,)) * 3, jnp.float32)
        labels = jnp.asarray(rng.integers(0, C, size=shape), jnp.int32)
        mask = jnp.asarray(rng.integers(0, 2, size=shape), jnp.float32)
        w = jnp.asarray(rng.uniform(0.2, 3.0, size=C), jnp.float32)
        onehot = jax.nn.one_hot(labels, C, dtype=logits.dtype)
        return logits, labels, onehot, mask, w

    @pytest.mark.parametrize("use_mask", [False, True])
    @pytest.mark.parametrize("use_w", [False, True])
    def test_matches_onehot_form(self, use_mask, use_w):
        from semanticsegmentation_tensorflow_tpu.train.loss import (
            softmax_cross_entropy_sum, softmax_cross_entropy_sum_cmajor,
        )
        logits, labels, onehot, mask, w = self._case(0)
        m = mask if use_mask else None
        cw = w if use_w else None

        def f_ref(z):
            s, n = softmax_cross_entropy_sum(z, onehot, m, cw)
            return s, n

        def f_cm(z):
            s, n = softmax_cross_entropy_sum_cmajor(z, labels, 3, m, cw)
            return s, n

        (s0, n0), g0 = jax.value_and_grad(lambda z: f_ref(z)[0])(logits), None
        s1, n1 = f_cm(logits)
        np.testing.assert_allclose(float(s1), float(f_ref(logits)[0]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(n1), float(f_ref(logits)[1]))
        gr = jax.grad(lambda z: f_ref(z)[0])(logits)
        gc = jax.grad(lambda z: f_cm(z)[0])(logits)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gr),
                                   atol=1e-5, rtol=1e-4)

    def test_argmax_impl_equal(self, monkeypatch):
        from semanticsegmentation_tensorflow_tpu.train import step as step_mod
        logits, *_ = self._case(1)
        monkeypatch.setenv("SEG_LOSS_IMPL", "cmajor")
        a = np.asarray(step_mod._argmax_classes(logits))
        monkeypatch.setenv("SEG_LOSS_IMPL", "nhwc")
        b = np.asarray(step_mod._argmax_classes(logits))
        np.testing.assert_array_equal(a, b)

    def test_train_step_same_under_both_impls(self, monkeypatch):
        """One real train step (tiny U-Net): loss + cm + updated params match
        across SEG_LOSS_IMPL settings (fresh jit per setting)."""
        from semanticsegmentation_tensorflow_tpu.models import build_model
        from semanticsegmentation_tensorflow_tpu.train.state import (
            create_train_state, make_optimizer,
        )
        from semanticsegmentation_tensorflow_tpu.train.step import (
            make_train_step,
        )
        from semanticsegmentation_tensorflow_tpu.data import synthetic_batch

        def run(impl):
            monkeypatch.setenv("SEG_LOSS_IMPL", impl)
            model = build_model("unet", num_classes=2, base_features=8,
                                dtype=jnp.float32)
            state = create_train_state(
                model, jax.random.key(0), (4, 32, 32, 3),
                make_optimizer("sgd", 1e-2))
            batch = synthetic_batch(4, 32, 32)
            step = make_train_step(num_classes=2)
            state, out = step(state, batch)
            return (float(out["loss"]), np.asarray(out["cm"]),
                    jax.tree.leaves(state.params)[0])

        l0, cm0, p0 = run("nhwc")
        l1, cm1, p1 = run("cmajor")
        np.testing.assert_allclose(l1, l0, rtol=1e-5)
        np.testing.assert_array_equal(cm1, cm0)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   atol=1e-6)


class TestBinaryLoss:
    """softmax_cross_entropy_sum_binary == the one-hot NHWC form — values,
    counts, and GRADIENTS — for every mask/weight combination, plus the
    l1>l0 argmax's bit-exactness (ties included). The binary form exists
    because the C-minor loss+argmax chain measured ~13 ms/step in the
    round-5 SegNet b8 profile and the cmajor relayout fix was rejected
    on-chip; the plane form has no transpose (SEG_LOSS_IMPL=binary)."""

    def _case(self, seed, shape=(2, 8, 10), dtype=jnp.float32):
        rng = np.random.default_rng(seed)
        logits = jnp.asarray(rng.normal(size=shape + (2,)) * 3, dtype)
        labels = jnp.asarray(rng.integers(0, 2, size=shape), jnp.int32)
        mask = jnp.asarray(rng.integers(0, 2, size=shape), jnp.float32)
        w = jnp.asarray(rng.uniform(0.2, 3.0, size=2), jnp.float32)
        return logits, labels, mask, w

    @pytest.mark.parametrize("use_mask", [False, True])
    @pytest.mark.parametrize("use_w", [False, True])
    def test_matches_onehot_form(self, use_mask, use_w):
        from semanticsegmentation_tensorflow_tpu.train.loss import (
            softmax_cross_entropy_sum, softmax_cross_entropy_sum_binary,
        )
        logits, labels, mask, w = self._case(0)
        m = mask if use_mask else None
        cw = w if use_w else None
        onehot = jax.nn.one_hot(labels, 2, dtype=logits.dtype)

        def f_ref(z):
            return softmax_cross_entropy_sum(z, onehot, m, cw)

        def f_bin(z):
            return softmax_cross_entropy_sum_binary(z, labels, m, cw)

        s0, n0 = f_ref(logits)
        s1, n1 = f_bin(logits)
        np.testing.assert_allclose(float(s1), float(s0), rtol=1e-5)
        np.testing.assert_allclose(float(n1), float(n0))
        gr = jax.grad(lambda z: f_ref(z)[0])(logits)
        gb = jax.grad(lambda z: f_bin(z)[0])(logits)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gr),
                                   atol=1e-5, rtol=1e-4)

    def test_bf16_logits_grad_dtype_and_value(self):
        """bf16 logits: the binary form upcasts to f32 internally but the
        gradient comes back in the logits dtype (what the conv backward
        needs), and values still track the f32 one-hot reference."""
        from semanticsegmentation_tensorflow_tpu.train.loss import (
            softmax_cross_entropy_sum, softmax_cross_entropy_sum_binary,
        )
        logits, labels, mask, _ = self._case(3, dtype=jnp.bfloat16)
        zf = logits.astype(jnp.float32)
        onehot = jax.nn.one_hot(labels, 2, dtype=jnp.float32)
        s_ref, _ = softmax_cross_entropy_sum(zf, onehot, mask)
        s_bin, _ = softmax_cross_entropy_sum_binary(logits, labels, mask)
        np.testing.assert_allclose(float(s_bin), float(s_ref), rtol=2e-2)
        g = jax.grad(
            lambda z: softmax_cross_entropy_sum_binary(z, labels, mask)[0]
        )(logits)
        assert g.dtype == jnp.bfloat16

    def test_rejects_non_binary(self):
        from semanticsegmentation_tensorflow_tpu.train.loss import (
            softmax_cross_entropy_sum_binary,
        )
        with pytest.raises(ValueError, match="C==2"):
            softmax_cross_entropy_sum_binary(
                jnp.zeros((1, 2, 2, 3)), jnp.zeros((1, 2, 2), jnp.int32))

    def test_argmax_impl_bit_exact_with_ties(self, monkeypatch):
        from semanticsegmentation_tensorflow_tpu.train import step as step_mod
        logits, *_ = self._case(1)
        # force exact ties on a few pixels — argmax picks class 0 there
        logits = logits.at[0, 0, :4, 1].set(logits[0, 0, :4, 0])
        monkeypatch.setenv("SEG_LOSS_IMPL", "binary")
        a = np.asarray(step_mod._argmax_classes(logits))
        monkeypatch.setenv("SEG_LOSS_IMPL", "nhwc")
        b = np.asarray(step_mod._argmax_classes(logits))
        np.testing.assert_array_equal(a, b)
        assert a[0, 0, :4].max() == 0  # ties resolved to class 0

    def test_argmax_impl_falls_back_above_c2(self, monkeypatch):
        from semanticsegmentation_tensorflow_tpu.train import step as step_mod
        rng = np.random.default_rng(2)
        logits = jnp.asarray(rng.normal(size=(2, 4, 5, 3)), jnp.float32)
        monkeypatch.setenv("SEG_LOSS_IMPL", "binary")
        a = np.asarray(step_mod._argmax_classes(logits))
        np.testing.assert_array_equal(a, np.argmax(np.asarray(logits), -1))

    def test_train_step_same_under_binary_impl(self, monkeypatch):
        """One real train step (tiny U-Net, C=2): loss + cm + updated params
        match nhwc across SEG_LOSS_IMPL=binary (fresh jit per setting)."""
        from semanticsegmentation_tensorflow_tpu.models import build_model
        from semanticsegmentation_tensorflow_tpu.train.state import (
            create_train_state, make_optimizer,
        )
        from semanticsegmentation_tensorflow_tpu.train.step import (
            make_train_step,
        )
        from semanticsegmentation_tensorflow_tpu.data import synthetic_batch

        def run(impl):
            monkeypatch.setenv("SEG_LOSS_IMPL", impl)
            model = build_model("unet", num_classes=2, base_features=8,
                                dtype=jnp.float32)
            state = create_train_state(
                model, jax.random.key(0), (4, 32, 32, 3),
                make_optimizer("sgd", 1e-2))
            batch = synthetic_batch(4, 32, 32)
            step = make_train_step(num_classes=2)
            state, out = step(state, batch)
            return (float(out["loss"]), np.asarray(out["cm"]),
                    jax.tree.leaves(state.params)[0])

        l0, cm0, p0 = run("nhwc")
        l1, cm1, p1 = run("binary")
        np.testing.assert_allclose(l1, l0, rtol=1e-5)
        np.testing.assert_array_equal(cm1, cm0)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   atol=1e-6)

    def test_eval_step_road_hist_under_binary_impl(self, monkeypatch):
        """eval road_hist via sigmoid(l1-l0) matches the softmax[...,1]
        histogram (same bins) on a real eval step."""
        from semanticsegmentation_tensorflow_tpu.models import build_model
        from semanticsegmentation_tensorflow_tpu.train.state import (
            create_train_state, make_optimizer,
        )
        from semanticsegmentation_tensorflow_tpu.train.step import (
            make_eval_step,
        )
        from semanticsegmentation_tensorflow_tpu.data import synthetic_batch

        def run(impl):
            monkeypatch.setenv("SEG_LOSS_IMPL", impl)
            model = build_model("unet", num_classes=2, base_features=8,
                                dtype=jnp.float32)
            state = create_train_state(
                model, jax.random.key(0), (4, 32, 32, 3),
                make_optimizer("sgd", 1e-2))
            batch = synthetic_batch(4, 32, 32)
            step = make_eval_step(num_classes=2, road_hist=True)
            out = step(state, batch)
            return np.asarray(out["road_hist"]), np.asarray(out["cm"])

        h0, cm0 = run("nhwc")
        h1, cm1 = run("binary")
        np.testing.assert_array_equal(cm1, cm0)
        # sigmoid(d) == softmax[...,1] exactly in math; fp differences can
        # shift a pixel across a bin edge only if it lands within roundoff
        # of the edge — not the case for this fixture
        np.testing.assert_array_equal(h1, h0)
