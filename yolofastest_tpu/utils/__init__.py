from yolofastest_tpu.utils.logging import config_logger
from yolofastest_tpu.utils.visualize import plot_one_box

__all__ = ["config_logger", "plot_one_box"]
