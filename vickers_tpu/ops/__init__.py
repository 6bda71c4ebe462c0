from vickers_tpu.ops import components, geometry, image, morphology, postprocess

__all__ = ["components", "geometry", "image", "morphology", "postprocess"]
