"""stereo_rcnn_tpu — a TPU-native stereo 3D object detection framework.

Built from scratch on JAX/XLA/Pallas with the capabilities of Stereo R-CNN
(CVPR 2019).  See SURVEY.md at the repo root for the structural map of the
reference this framework re-implements, and README.md for usage.
"""

__version__ = "0.1.0"

from stereo_rcnn_tpu.config import Config, load_config, tiny_test_config
