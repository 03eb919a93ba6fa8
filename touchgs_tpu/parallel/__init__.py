from touchgs_tpu.parallel.mesh import make_mesh, param_pspecs  # noqa: F401
from touchgs_tpu.parallel.sharded import make_sharded_train_step  # noqa: F401
