from matcha_tpu.parallel.mesh import (make_mesh, batch_sharding,  # noqa: F401
                                      frozen_sharding, param_sharding,
                                      shard_train_inputs)
