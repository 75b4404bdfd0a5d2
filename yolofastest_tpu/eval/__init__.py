from yolofastest_tpu.eval.map_eval import MAPEvaluator, average_precision

__all__ = ["MAPEvaluator", "average_precision"]
