"""Logging/timing utilities (reference mjmpc/utils/logger.py, timer.py)."""
from .logger import LoggerClass, get_logger
from .timer import TimeIt, timeit

__all__ = ["LoggerClass", "get_logger", "TimeIt", "timeit"]
