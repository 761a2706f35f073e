from stereo_rcnn_tpu.utils.host_preproc import (native_available,
                                                resize_subtract_pad)
from stereo_rcnn_tpu.utils.metrics import MetricsLogger, StepTimer
from stereo_rcnn_tpu.utils import profiling
