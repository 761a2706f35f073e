from stereo_rcnn_tpu.evalkit.kitti_eval import (DIFFICULTIES, FrameObjects,
                                                evaluate,
                                                frame_objects_from_labels,
                                                frame_objects_from_outputs,
                                                read_result_file,
                                                write_result_file)
from stereo_rcnn_tpu.evalkit.rotate_iou import (bev_corners, iou_3d,
                                                rotated_iou_bev)
