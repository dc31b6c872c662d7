from physimglobalpose_tpu.geometry import se3, metrics, pointcloud, depthio  # noqa: F401
