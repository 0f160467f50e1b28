from scenerf_tpu.fusion.tsdf import TSDFVolume, tsdf2occ

__all__ = ["TSDFVolume", "tsdf2occ"]
