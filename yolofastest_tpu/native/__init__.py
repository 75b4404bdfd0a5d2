from yolofastest_tpu.native.engine import NativeEngine, default_library_path

__all__ = ["NativeEngine", "default_library_path"]
