from sequenzo_spark.checkpoint.manifest import Manifest

__all__ = ["Manifest"]
