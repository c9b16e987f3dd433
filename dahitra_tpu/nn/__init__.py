from dahitra_tpu.nn.blocks import (
    ConvRelu,
    ConvReluBN,
    CrossAttention,
    FeedForward,
    MultiHeadSelfAttention,
    SemanticTokenizer,
    TransformerDecoder,
    TransformerEncoder,
    TwoLayerConv,
    max_pool_3x3_s2,
    upsample_bilinear,
    upsample_nearest,
)
from dahitra_tpu.nn.resnet import BasicBlock, ResNetTrunk

__all__ = [
    "ConvRelu",
    "ConvReluBN",
    "CrossAttention",
    "FeedForward",
    "MultiHeadSelfAttention",
    "SemanticTokenizer",
    "TransformerDecoder",
    "TransformerEncoder",
    "TwoLayerConv",
    "max_pool_3x3_s2",
    "upsample_bilinear",
    "upsample_nearest",
    "BasicBlock",
    "ResNetTrunk",
]
