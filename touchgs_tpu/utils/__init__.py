from touchgs_tpu.utils import transforms  # noqa: F401
