from stereo_rcnn_tpu.data.kitti import (KittiDataset, KittiObject,
                                        StereoAnnotation,
                                        annotations_for_frame,
                                        derive_stereo_annotation,
                                        pack_ground_truth, parse_label_file)
from stereo_rcnn_tpu.data.pipeline import KittiPipeline, load_image
from stereo_rcnn_tpu.data.synthetic import (random_scene, render_pair,
                                            synthetic_batch,
                                            write_kitti_frame)
