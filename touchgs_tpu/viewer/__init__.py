"""Live training/scene viewer (nerfstudio-viewer analogue)."""
from touchgs_tpu.viewer.server import ViewerServer, orbit_c2w

__all__ = ["ViewerServer", "orbit_c2w"]
