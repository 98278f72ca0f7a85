from uemda_tpu.models.config import BackboneConfig, DeeplabV2Config, PPMConfig
from uemda_tpu.models.deeplabv2 import DeeplabV2, instance_norm
from uemda_tpu.models.heads import ASPPHead, PPMBilinear
from uemda_tpu.models.resnet import RESNET_SPECS, ResNetEncoder
