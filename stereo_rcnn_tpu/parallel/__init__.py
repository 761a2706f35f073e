from stereo_rcnn_tpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS,
                                           batch_sharding, jit_inference,
                                           jit_train_step, make_mesh,
                                           replicate, replicated,
                                           shard_batch)
