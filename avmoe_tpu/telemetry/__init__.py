from avmoe_tpu.telemetry.experts import ExpertUsageTracker
from avmoe_tpu.telemetry.meters import AverageMeter, Timer

__all__ = ["ExpertUsageTracker", "AverageMeter", "Timer"]
