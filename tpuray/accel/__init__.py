from tpuray.accel.bvh import build_bvh  # noqa: F401
