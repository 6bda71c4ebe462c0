from vickers_tpu.data.loader import CachedDataset
from vickers_tpu.data.manifest import Manifest, Sample, reference_split, scan, split_manifest

__all__ = ["CachedDataset", "Manifest", "Sample", "reference_split", "scan", "split_manifest"]
