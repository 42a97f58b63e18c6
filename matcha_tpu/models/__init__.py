from matcha_tpu.models.hypersagnn import (  # noqa: F401
    HyperSAGNN, ModelDims, init_model, build_frozen_tables)
