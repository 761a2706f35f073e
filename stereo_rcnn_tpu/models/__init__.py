from stereo_rcnn_tpu.models.resnet_fpn import (Bottleneck, FrozenBatchNorm,
                                               ResNetFPN)
from stereo_rcnn_tpu.models.stereo_rpn import (Proposals, StereoRPNHead,
                                               select_proposals)
from stereo_rcnn_tpu.models.heads import KeypointHead, RCNNHead, RCNNOutputs
from stereo_rcnn_tpu.models.detector import (Detections, StereoRCNN,
                                             build_model, decode_keypoints,
                                             forward_raw, init_params,
                                             make_inference_fn,
                                             postprocess_boxes,
                                             roi_features, run_keypoints)
