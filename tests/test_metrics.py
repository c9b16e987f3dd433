"""Confusion-matrix metric parity vs an independent numpy implementation."""
import numpy as np
import pytest

from dahitra_tpu.metrics import (
    ConfusionAccumulator,
    batch_confusion_matrix,
    cm2f1,
    cm2score,
    harmonic_mean,
    xview2_scores,
)


def numpy_hist(gt, pred, n):
    """Reference semantics: masked bincount of n*gt+pred (metric_tool.py:143-154)."""
    mask = (gt >= 0) & (gt < n)
    return np.bincount(
        n * gt[mask].astype(int) + pred[mask], minlength=n**2
    ).reshape(n, n)


@pytest.mark.parametrize("n", [2, 5])
def test_batch_confusion_matrix_matches_bincount(n):
    rng = np.random.default_rng(0)
    gt = rng.integers(0, n, size=(3, 17, 13)).astype(np.int32)
    # Sprinkle ignore labels.
    gt[0, :3, :3] = 255
    pred = rng.integers(0, n, size=(3, 17, 13)).astype(np.int32)
    cm = np.asarray(batch_confusion_matrix(pred, gt, n))
    expected = numpy_hist(gt.ravel(), pred.ravel(), n)
    np.testing.assert_array_equal(cm, expected)


def test_accumulator_and_scores():
    n = 2
    rng = np.random.default_rng(1)
    acc = ConfusionAccumulator(n)
    total = np.zeros((n, n), np.int64)
    for _ in range(4):
        gt = rng.integers(0, n, size=(2, 8, 8)).astype(np.int32)
        pred = rng.integers(0, n, size=(2, 8, 8)).astype(np.int32)
        acc.update(pred, gt)
        total += numpy_hist(gt.ravel(), pred.ravel(), n)
    np.testing.assert_array_equal(acc.matrix, total)

    scores = acc.scores()
    hist = total.astype(np.float64)
    eps = np.finfo(np.float32).eps
    tp = np.diag(hist)
    recall = tp / (hist.sum(1) + eps)
    precision = tp / (hist.sum(0) + eps)
    f1 = 2 * recall * precision / (recall + precision + eps)
    iu = tp / (hist.sum(1) + hist.sum(0) - tp + eps)
    assert scores["acc"] == pytest.approx(tp.sum() / (hist.sum() + eps))
    assert scores["mf1"] == pytest.approx(np.nanmean(f1))
    assert scores["miou"] == pytest.approx(np.nanmean(iu))
    for i in range(n):
        assert scores[f"F1_{i}"] == pytest.approx(f1[i])
        assert scores[f"iou_{i}"] == pytest.approx(iu[i])
    assert acc.f1() == pytest.approx(scores["mf1"])


def test_perfect_prediction_scores():
    acc = ConfusionAccumulator(2)
    gt = np.array([[[0, 1], [1, 0]]], np.int32)
    acc.update(gt, gt)
    s = acc.scores()
    assert s["mf1"] == pytest.approx(1.0, abs=1e-6)
    assert s["miou"] == pytest.approx(1.0, abs=1e-6)


def test_harmonic_mean_guard():
    # Matches metric_tool.py:67-69 semantics (epsilon inside the inverse).
    xs = [0.5, 0.5]
    assert harmonic_mean(xs) == pytest.approx(2 / ((0.5 + 1e-6) ** -1 * 2))


def test_xview2_score_formula():
    out = xview2_scores(0.8, np.array([0.9, 0.7, 0.7, 0.7]))
    f1 = 4.0 / np.sum(1.0 / (np.array([0.9, 0.7, 0.7, 0.7]) + 1e-6))
    assert out["score"] == pytest.approx(0.3 * 0.8 + 0.7 * f1)


def test_per_sample_confusion_matrix_matches_batch():
    import jax.numpy as jnp

    from dahitra_tpu.metrics.confusion import (batch_confusion_matrix,
                                               per_sample_confusion_matrix)

    rng = np.random.default_rng(11)
    pred = jnp.asarray(rng.integers(0, 3, (5, 16, 16)))
    gt = jnp.asarray(rng.integers(0, 4, (5, 16, 16)))  # 3 = out-of-range
    ps = np.asarray(per_sample_confusion_matrix(pred, gt, 3))
    assert ps.shape == (5, 3, 3)
    np.testing.assert_array_equal(
        ps.sum(axis=0), np.asarray(batch_confusion_matrix(pred, gt, 3)))
    # each sample's block matches its own standalone matrix
    for i in range(5):
        np.testing.assert_array_equal(
            ps[i], np.asarray(batch_confusion_matrix(pred[i:i+1],
                                                     gt[i:i+1], 3)))
