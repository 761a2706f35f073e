from stereo_rcnn_tpu.train.targets import (AnchorTargets, GroundTruth,
                                           RoiTargets, anchor_targets,
                                           proposal_targets)
from stereo_rcnn_tpu.train.losses import (LOSS_NAMES,
                                          combine_with_uncertainty,
                                          rcnn_losses, rpn_losses, smooth_l1,
                                          softmax_ce)
from stereo_rcnn_tpu.train.step import (Batch, TrainState, compute_losses,
                                        init_train_state, make_optimizer,
                                        make_train_step, param_label)
