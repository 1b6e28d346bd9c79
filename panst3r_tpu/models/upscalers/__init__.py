from panst3r_tpu.models.upscalers.pixel_shuffle import (
    PixelShuffleUpscaler, PixelShuffleUpscalerConfig)
from panst3r_tpu.models.upscalers.loftup import (
    LoftUpUpscaler, LoftUpUpscalerConfig)
