from touchgs_tpu.native.loader import NativeLoader, decode_png, native_available  # noqa: F401
