from vickers_tpu.models.resnet import ResNet34Encoder
from vickers_tpu.models.unet import VickersUNet, build_model, init_model

__all__ = ["ResNet34Encoder", "VickersUNet", "build_model", "init_model"]
