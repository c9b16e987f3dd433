from dahitra_tpu.pallas.fused_decoder import (
    fused_transformer_decoder,
    pack_decoder_params,
)

__all__ = ["fused_transformer_decoder", "pack_decoder_params"]
