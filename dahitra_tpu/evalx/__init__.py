from dahitra_tpu.evalx.evaluator import CDEvaluator

__all__ = ["CDEvaluator"]
