from octseg.ops.pallas.postprocess import fused_overlay_postprocess

__all__ = ['fused_overlay_postprocess']
