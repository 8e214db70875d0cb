from tpuray.viewer.server import ViewerServer

__all__ = ["ViewerServer"]
