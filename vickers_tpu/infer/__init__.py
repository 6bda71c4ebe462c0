from vickers_tpu.infer.engine import Detection, InferenceEngine, Segmenter
from vickers_tpu.infer.tiled import TiledEngine

__all__ = ["Detection", "InferenceEngine", "Segmenter", "TiledEngine"]
