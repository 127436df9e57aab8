"""Model zoo: GLN detector, MAC embedders, GAN domain adapter."""

from .embedders import MACVGG, MACResNet  # noqa: F401
from .gln import GLN, GLNConfig, postprocess_detections  # noqa: F401
from .resnet import ResNet50  # noqa: F401
