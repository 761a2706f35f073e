from stereo_rcnn_tpu.solve.box_estimator import (SolveResult,
                                                 observations_from_detection,
                                                 solve_batch, solve_pose)
from stereo_rcnn_tpu.solve.dense_align import (AlignResult, align_batch,
                                               align_depth)
