from phantom_vlb_tpu.utils.logging import CometLoggerSink, ConsoleLogger, get_logger
from phantom_vlb_tpu.utils.profiling import StepTimer, device_memory_stats, trace

__all__ = [
    "CometLoggerSink", "ConsoleLogger", "get_logger",
    "StepTimer", "device_memory_stats", "trace",
]
