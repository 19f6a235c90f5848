"""Logging/timing utilities (reference mjmpc/utils/logger.py, timer.py)."""
from .logger import LoggerClass, get_logger
from .timer import TimeIt, timeit
from .helpers import stack_tensor_dict_list, stack_tensor_list

__all__ = ["LoggerClass", "get_logger", "TimeIt", "timeit",
           "stack_tensor_dict_list", "stack_tensor_list"]
