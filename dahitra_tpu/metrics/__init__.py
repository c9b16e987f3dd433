from dahitra_tpu.metrics.confusion import (
    ConfusionAccumulator,
    batch_confusion_matrix,
    cm2f1,
    cm2score,
    harmonic_mean,
    xview2_scores,
)

__all__ = [
    "ConfusionAccumulator",
    "batch_confusion_matrix",
    "cm2f1",
    "cm2score",
    "harmonic_mean",
    "xview2_scores",
]
