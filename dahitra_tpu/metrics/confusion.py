"""On-device confusion-matrix metrics.

Functional parity targets (reference, /root/reference):
  * misc/metric_tool.py:141-158  get_confuse_matrix — masked bincount of
    ``n*gt + pred``; here a jit-compiled one-hot scatter-add that never
    leaves the chip (the reference synced argmax to host every batch).
  * misc/metric_tool.py:96-138   cm2score — acc / per-class P/R/F1/IoU /
    mf1 / miou / fwavacc from the accumulated matrix.
  * misc/metric_tool.py:48-63    ConfuseMatrixMeter — running accumulation.
  * xBD_code/train.py:247-290    validate() — xView2 score
    0.3*dice_loc + 0.7*harmonic-mean damage F1.

The accumulation runs under jit on TPU; the final (n_class², tiny) matrix is
pulled to host once per epoch for the numpy score arithmetic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_EPS = float(np.finfo(np.float32).eps)


def _one_hot_cm(g: jax.Array, p: jax.Array, num_classes: int) -> jax.Array:
    """One (n_class, n_class) CM from flat int32 label/pred vectors: the
    shared one-hot MXU contraction (gt outside [0, num_classes) dropped;
    bf16 one-hots, fp32 accumulation — exact up to 2^24 counts/cell)."""
    valid = ((g >= 0) & (g < num_classes)).astype(jnp.bfloat16)
    oh_gt = jax.nn.one_hot(g, num_classes, dtype=jnp.bfloat16) * valid[:, None]
    oh_pr = jax.nn.one_hot(p, num_classes, dtype=jnp.bfloat16)
    return jnp.einsum("nc,nk->ck", oh_gt, oh_pr,
                      preferred_element_type=jnp.float32).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_classes",))
def batch_confusion_matrix(pred: jax.Array, gt: jax.Array, num_classes: int) -> jax.Array:
    """Confusion matrix of one batch, rows = ground truth, cols = prediction.

    Matches misc/metric_tool.py:143-154: pixels with gt outside
    [0, num_classes) (e.g. the 255 ignore label) are dropped. ``pred`` must
    already be class indices (argmax output).

    Implemented as a one-hot contraction ``onehot(gt)^T @ onehot(pred)``
    rather than a scatter-add: at n_class 2-5 this is one MXU matmul over
    the pixel axis instead of a serialized scatter over millions of
    elements (the TPU has no fast random scatter).
    """
    gt = gt.reshape(-1).astype(jnp.int32)
    pred = pred.reshape(-1).astype(jnp.int32)
    n = gt.shape[0]
    # fp32 accumulation is exact up to 2^24 counts per cell; chunk the pixel
    # axis so each matmul stays within that, summing chunks in int32.
    chunk = 1 << 22
    pad = (-n) % chunk
    if pad:
        gt = jnp.concatenate([gt, jnp.full((pad,), -1, jnp.int32)])
        pred = jnp.concatenate([pred, jnp.zeros((pad,), jnp.int32)])
    k = gt.shape[0] // chunk
    gt = gt.reshape(k, chunk)
    pred = pred.reshape(k, chunk)

    return jnp.sum(jax.vmap(lambda g, p: _one_hot_cm(g, p, num_classes))(
        gt, pred), axis=0)


@functools.partial(jax.jit, static_argnames=("num_classes",))
def per_sample_confusion_matrix(pred: jax.Array, gt: jax.Array,
                                num_classes: int) -> jax.Array:
    """(B, n_class, n_class) confusion matrix per sample — same one-hot MXU
    contraction as ``batch_confusion_matrix``, vmapped over the batch axis.
    Lets callers regroup samples after an evaluation pass (e.g. the 16-patch
    per-patch score blocks of eval_cd.py:49-55) without re-running the
    model. Per-sample pixel counts (<= a few MPix) stay within fp32's exact
    integer range, so no chunking is needed."""
    b = pred.shape[0]
    gt = gt.reshape(b, -1).astype(jnp.int32)
    pred = pred.reshape(b, -1).astype(jnp.int32)

    return jax.vmap(lambda g, p: _one_hot_cm(g, p, num_classes))(gt, pred)


def cm2f1(cm: np.ndarray) -> float:
    """Mean F1 from a confusion matrix (misc/metric_tool.py:72-93)."""
    hist = np.asarray(cm, np.float64)
    tp = np.diag(hist)
    sum_rows = hist.sum(axis=1)
    sum_cols = hist.sum(axis=0)
    recall = tp / (sum_rows + _EPS)
    precision = tp / (sum_cols + _EPS)
    f1 = 2 * recall * precision / (recall + precision + _EPS)
    return float(np.nanmean(f1))


def cm2score(cm: np.ndarray) -> dict:
    """Score dict from a confusion matrix (misc/metric_tool.py:96-138).

    Keys: acc, miou, mf1, iou_i, F1_i, precision_i, recall_i.
    """
    hist = np.asarray(cm, np.float64)
    n_class = hist.shape[0]
    tp = np.diag(hist)
    sum_rows = hist.sum(axis=1)
    sum_cols = hist.sum(axis=0)

    acc = tp.sum() / (hist.sum() + _EPS)
    recall = tp / (sum_rows + _EPS)
    precision = tp / (sum_cols + _EPS)
    f1 = 2 * recall * precision / (recall + precision + _EPS)
    mean_f1 = np.nanmean(f1)

    iu = tp / (sum_rows + sum_cols - tp + _EPS)
    mean_iu = np.nanmean(iu)

    score = {"acc": float(acc), "miou": float(mean_iu), "mf1": float(mean_f1)}
    score.update({f"iou_{i}": float(iu[i]) for i in range(n_class)})
    score.update({f"F1_{i}": float(f1[i]) for i in range(n_class)})
    score.update({f"precision_{i}": float(precision[i]) for i in range(n_class)})
    score.update({f"recall_{i}": float(recall[i]) for i in range(n_class)})
    return score


def harmonic_mean(xs) -> float:
    """Harmonic mean with the reference's +1e-6 guard (metric_tool.py:67-69)."""
    xs = list(xs)
    return len(xs) / sum((x + 1e-6) ** -1 for x in xs)


class ConfusionAccumulator:
    """Running confusion matrix (reference ConfuseMatrixMeter).

    ``update`` accepts device arrays and accumulates on device; nothing is
    transferred to host until ``scores()``/``f1()`` is called. This removes
    the per-batch D2H sync of the reference (models/trainer.py:163-173).
    """

    def __init__(self, n_class: int):
        self.n_class = n_class
        self.clear()

    def clear(self):
        self._cm = jnp.zeros((self.n_class, self.n_class), jnp.int32)

    def update(self, pred: jax.Array, gt: jax.Array) -> None:
        self._cm = self._cm + batch_confusion_matrix(pred, gt, self.n_class)

    def update_cm(self, cm: jax.Array) -> None:
        """Accumulate a precomputed batch confusion matrix."""
        self._cm = self._cm + cm.astype(jnp.int32)

    @property
    def matrix(self) -> np.ndarray:
        return np.asarray(self._cm)

    def f1(self) -> float:
        return cm2f1(self.matrix)

    def scores(self) -> dict:
        return cm2score(self.matrix)


def xview2_scores(dice_loc: float, class_f1: np.ndarray) -> dict:
    """xView2 score = 0.3 * localization dice + 0.7 * harmonic-mean damage F1.

    Mirrors xBD_code/train.py:281-289 (class_f1 holds the 4 damage classes,
    already computed as 2tp/(2tp+fp+fn)).
    """
    f1 = 4.0 / np.sum(1.0 / (np.asarray(class_f1) + 1e-6))
    score = 0.3 * dice_loc + 0.7 * f1
    return {"score": float(score), "dice_loc": float(dice_loc), "damage_f1": float(f1)}
