from yolofastest_tpu.kernels.res_block import fused_res_block

__all__ = ["fused_res_block"]
