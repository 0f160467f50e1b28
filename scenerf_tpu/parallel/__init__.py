from scenerf_tpu.parallel.mesh import (DATA_AXIS, make_mesh, shard_batch,
                                       replicate)

__all__ = ["DATA_AXIS", "make_mesh", "shard_batch", "replicate"]
