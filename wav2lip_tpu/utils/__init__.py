from wav2lip_tpu.utils.profiling import StageTimer, device_trace
from wav2lip_tpu.utils.logging import MetricsLogger

__all__ = ["StageTimer", "device_trace", "MetricsLogger"]
