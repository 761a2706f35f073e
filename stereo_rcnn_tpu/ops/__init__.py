from stereo_rcnn_tpu.ops.nms import nms_indices, nms_mask
from stereo_rcnn_tpu.ops.roi_align import (fpn_level_assignment,
                                           multilevel_roi_align, roi_align)
