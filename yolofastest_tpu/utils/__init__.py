from yolofastest_tpu.utils.compile_cache import enable_compile_cache
from yolofastest_tpu.utils.logging import config_logger
from yolofastest_tpu.utils.visualize import plot_one_box

__all__ = ["config_logger", "enable_compile_cache", "plot_one_box"]
