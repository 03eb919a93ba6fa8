from touchgs_tpu.vision.monodepth import VisualPipeline, DPTDepthModel  # noqa: F401
