from yolofastest_tpu.eval.map_eval import (MAPEvaluator, average_precision,
                                           make_backend_eval_fn)

__all__ = ["MAPEvaluator", "average_precision", "make_backend_eval_fn"]
