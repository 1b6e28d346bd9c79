from panst3r_tpu.models.encoder import ViTEncoder, ViTEncoderConfig
from panst3r_tpu.models.decoder import MemoryDecoder, MemoryDecoderConfig
from panst3r_tpu.models.memory import TokenMemory
from panst3r_tpu.models.dino import DinoEncoder, DinoEncoderConfig
from panst3r_tpu.models.text_encoder import TextEncoder, TextEncoderConfig
from panst3r_tpu.models.input_mixer import InputMixer, InputMixerConfig
from panst3r_tpu.models.upscalers import (
    PixelShuffleUpscaler, PixelShuffleUpscalerConfig,
    LoftUpUpscaler, LoftUpUpscalerConfig,
)
from panst3r_tpu.models.mask_transformer import MaskTransformer, MaskTransformerConfig
from panst3r_tpu.models.panoptic_decoder import PanopticDecoder, PanopticDecoderConfig
from panst3r_tpu.models.panst3r import PanSt3R, PanSt3RConfig
