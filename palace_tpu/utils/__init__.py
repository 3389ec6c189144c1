from palace_tpu.utils.logging import get_logger, log
from palace_tpu.utils.timers import StageTimer, Metrics
