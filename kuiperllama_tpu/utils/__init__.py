from .profiling import Timer, device_time, log_json, trace
