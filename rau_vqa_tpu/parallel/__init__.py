from rau_vqa_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    param_pspecs,
    state_shardings,
    batch_pspec,
    make_sharded_train_step,
    make_sharded_predict,
    make_sharded_pixels_predict,
    shard_batch,
)
