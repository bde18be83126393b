import jax.numpy as jnp
import numpy as np

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
