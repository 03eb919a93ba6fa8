from touchgs_tpu.data.cameras import Camera, Cameras  # noqa: F401
from touchgs_tpu.data.depth_io import read_depth_mm, write_depth_mm  # noqa: F401
from touchgs_tpu.data.splits import linspace_split  # noqa: F401
from touchgs_tpu.data.scene import Scene, load_scene  # noqa: F401
